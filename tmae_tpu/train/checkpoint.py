"""Checkpoint save/restore (Orbax) with the reference's three load roles
(SURVEY.md §5.4): full resume (step + params + batch_stats + optimizer), weights-only
pretrained transfer with shape-matched non-strict merging
(``detector3d_template.py:385-417``), and eval load.
"""

from __future__ import annotations

import logging
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp

log = logging.getLogger(__name__)


def save_checkpoint(ckpt_dir, state, step: int, max_keep: int = 5):
    from flax import serialization

    ckpt_dir = Path(ckpt_dir).resolve()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = ckpt_dir / f'checkpoint_{step}'
    ckptr = ocp.StandardCheckpointer()
    # store as a plain state dict: robust to dataclass/pytree registration
    # differences between the saving and restoring process
    ckptr.save(
        path, serialization.to_state_dict(jax.device_get(state)), force=True
    )
    ckptr.wait_until_finished()
    # retention pruning by step (train_utils.py:218-235 equivalent);
    # primary process only — the save above is collective, the rmtree is not
    if jax.process_index() == 0:
        ckpts = sorted(
            ckpt_dir.glob('checkpoint_*'),
            key=lambda p: int(p.name.split('_')[-1]),
        )
        for old in ckpts[:-max_keep]:
            import shutil
            shutil.rmtree(old, ignore_errors=True)
    return path


def latest_checkpoint(ckpt_dir):
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    ckpts = sorted(
        ckpt_dir.glob('checkpoint_*'),
        key=lambda p: int(p.name.split('_')[-1]),
    )
    return ckpts[-1] if ckpts else None


def restore_checkpoint(path, target_state):
    from flax import serialization

    ckptr = ocp.StandardCheckpointer()
    target_sd = serialization.to_state_dict(jax.device_get(target_state))
    raw = ckptr.restore(Path(path).resolve(), target=target_sd)
    return serialization.from_state_dict(target_state, raw)


def load_pretrained_params(path, params, batch_stats=None):
    """Shape-matched, non-strict weights-only transfer: keys present in both trees
    with matching shapes are copied; everything else keeps its fresh init (the
    MAE→finetune role, detector3d_template.py:385-417)."""
    ckptr = ocp.StandardCheckpointer()
    raw = ckptr.restore(Path(path).resolve())
    src_params = raw.get('params', raw)
    src_stats = raw.get('batch_stats', {})

    def merge(dst, src, prefix=''):
        if isinstance(dst, dict):
            out = {}
            for k, v in dst.items():
                if isinstance(src, dict) and k in src:
                    out[k] = merge(v, src[k], prefix + '/' + k)
                else:
                    log.info('pretrained: missing %s%s — keeping init', prefix, k)
                    out[k] = v
            return out
        src_arr = np.asarray(src)
        if src_arr.shape == tuple(np.shape(dst)):
            return src_arr
        log.info('pretrained: shape mismatch at %s (%s vs %s) — keeping init',
                 prefix, src_arr.shape, np.shape(dst))
        return dst

    new_params = merge(jax.device_get(params), src_params)
    if batch_stats is None:
        return new_params
    new_stats = merge(jax.device_get(batch_stats), src_stats)
    return new_params, new_stats
