#!/usr/bin/env python
"""Evaluation CLI — counterpart of the reference ``tools/test.py``: loads a
checkpoint (single or --eval_all polling over the ckpt dir) and runs the dataset's
AP evaluation."""

from __future__ import annotations

import argparse
import datetime
import logging
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

from tmae_tpu.config import cfg_from_yaml_file, cfg_from_list
from tmae_tpu.datasets.dataset import build_dataloader
from tmae_tpu.models.detectors import build_detector
from tmae_tpu.train.checkpoint import latest_checkpoint, restore_checkpoint
from tmae_tpu.train.evaluator import eval_one_epoch
from tmae_tpu.train.optimization import build_optimizer
from tmae_tpu.train.trainer import create_train_state


def parse_config():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg_file', type=str, required=True)
    parser.add_argument('--batch_size', type=int, default=None)
    parser.add_argument('--ckpt', type=str, default=None)
    parser.add_argument('--extra_tag', type=str, default='default')
    parser.add_argument('--eval_all', action='store_true')
    parser.add_argument('--max_waiting_mins', type=int, default=30)
    parser.add_argument('--fixed_gap_eval', type=int, default=1)
    parser.add_argument('--set', dest='set_cfgs', default=None, nargs='*')
    parser.add_argument('--fuse_conv_bn', action='store_true',
                        help='fold BN into convs before eval (API parity with '
                             'the reference; XLA already fuses the affine at '
                             'compile time)')
    parser.add_argument('--launcher', choices=['none', 'jax', 'pytorch',
                                               'slurm'], default='none',
                        help='any non-none value initializes jax.distributed '
                             'for multi-host eval (same resolution as '
                             'train.py)')
    parser.add_argument('--tcp_port', type=int, default=18888)
    parser.add_argument('--local_rank', type=int, default=None,
                        help='ignored (torch-DDP artifact)')
    args = parser.parse_args()
    cfg = cfg_from_yaml_file(args.cfg_file)
    if args.set_cfgs is not None:
        cfg = cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def load_variables(cfg, model, loader, ckpt_path, fuse=False):
    init_batch = next(iter(loader))
    init_inputs = {
        k: jnp.asarray(v) for k, v in init_batch.items() if k != 'frame_id'
    }
    variables = model.init(jax.random.PRNGKey(0), init_inputs, train=False)
    tx, _ = build_optimizer(dict(cfg.OPTIMIZATION), 1)
    state = create_train_state(variables, tx)
    state = restore_checkpoint(ckpt_path, state)
    params, stats = state.params, state.batch_stats
    if fuse:
        from tmae_tpu.utils.fuse import fuse_conv_bn
        params, stats = fuse_conv_bn(params, stats)
    return {'params': params, 'batch_stats': stats}


def main():
    args, cfg = parse_config()
    from train import init_distributed
    init_distributed(args)  # before ANY backend-touching jax call
    out_dir = REPO / 'output' / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    eval_dir = out_dir / 'eval'
    eval_dir.mkdir(parents=True, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO if jax.process_index() == 0 else logging.WARNING,
        format='%(asctime)s %(levelname)s %(message)s')
    logger = logging.getLogger('test')

    if args.fixed_gap_eval >= 0:
        cfg.DATA_CONFIG.FIXED_GAP = args.fixed_gap_eval
    batch_size = args.batch_size or int(cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU)
    dataset, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size, training=False,
        runtime_cfg=cfg.RUNTIME, seed=1024,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    model = build_detector(cfg)

    def run_one(ckpt_path, tag):
        variables = load_variables(cfg, model, loader, ckpt_path,
                                   fuse=args.fuse_conv_bn)
        ap_str, ap_dict = eval_one_epoch(
            cfg, model, variables, loader, dataset, cfg.CLASS_NAMES,
            result_dir=eval_dir / tag, logger=logger,
        )
        logger.info('ckpt %s:\n%s', ckpt_path, ap_str)
        return ap_dict

    if not args.eval_all:
        ckpt = args.ckpt or latest_checkpoint(out_dir / 'ckpt')
        assert ckpt is not None, 'no checkpoint found'
        run_one(ckpt, 'single')
        return

    # polling mode (reference repeat_eval_ckpt, test.py:181-263)
    evaluated = set()
    record = eval_dir / 'eval_list.txt'
    if record.exists():
        evaluated = set(record.read_text().split())
    wait_start = time.time()
    while True:
        ckpt = latest_checkpoint(out_dir / 'ckpt')
        if ckpt is None or str(ckpt) in evaluated:
            if (time.time() - wait_start) / 60 > args.max_waiting_mins:
                break
            time.sleep(30)
            continue
        wait_start = time.time()
        run_one(ckpt, ckpt.name)
        evaluated.add(str(ckpt))
        with open(record, 'a') as f:
            f.write(str(ckpt) + '\n')


if __name__ == '__main__':
    main()
