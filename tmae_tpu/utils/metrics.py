"""Metrics / observability (SURVEY.md §5.5): JSONL + TensorBoard scalar logging
and the per-iteration timing meters the reference shows in its tqdm postfix
(``common_utils.AverageMeter``, ``train_utils.py:102-126``)."""

from __future__ import annotations

import json
import time
from pathlib import Path


class AverageMeter:
    """Running mean/current value (reference common_utils.py:316-331)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self):
        return self.sum / max(self.count, 1)


class Timer:
    def __init__(self):
        self.t0 = time.perf_counter()

    def lap(self):
        now = time.perf_counter()
        dt = now - self.t0
        self.t0 = now
        return dt


class MetricsLogger:
    """Scalars → metrics.jsonl (always) + TensorBoard event files (when torch's
    SummaryWriter imports; replaces tensorboardX, train_utils.py:128-132)."""

    def __init__(self, log_dir, enable_tensorboard=True, wandb_project=None):
        # log_dir=None → disabled sink (non-zero ranks in multi-host runs)
        if log_dir is None:
            self.log_dir = None
            self._jsonl = self._tb = self._wandb = None
            return
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.log_dir / 'metrics.jsonl', 'a')
        self._tb = None
        if enable_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(str(self.log_dir / 'tensorboard'))
            except Exception:
                self._tb = None
        # optional wandb mirror (reference train.py:176-181); silently skipped
        # when wandb isn't installed in the image
        self._wandb = None
        if wandb_project:
            try:
                import wandb
                self._wandb = wandb.init(project=wandb_project,
                                         dir=str(self.log_dir))
            except Exception:
                self._wandb = None

    def log(self, step: int, scalars: dict):
        if self._jsonl is None:
            return
        rec = {'step': int(step)}
        for k, v in scalars.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                continue
        self._jsonl.write(json.dumps(rec) + '\n')
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in rec.items():
                if k != 'step':
                    self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(rec, step=step)

    def close(self):
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
