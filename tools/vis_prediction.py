#!/usr/bin/env python
"""Prediction visualization (reference ``tools/vis_prediction.py`` +
``visual_utils``): renders BEV scatter plots of points, GT boxes and predicted
boxes to PNG via matplotlib (open3d/mayavi are not available in this
environment; matplotlib BEV rendering covers the inspection role headlessly).

Usage: python tools/vis_prediction.py --cfg_file ... [--ckpt ...] [--num 4]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def draw_bev(ax, points, gt_boxes=None, pred_boxes=None, pred_scores=None):
    from tmae_tpu.ops.geometry_np import boxes_to_corners_bev
    ax.scatter(points[:, 0], points[:, 1], s=0.2, c=points[:, 2], cmap='viridis')

    def draw_boxes(boxes, color):
        if boxes is None or len(boxes) == 0:
            return
        corners = boxes_to_corners_bev(np.asarray(boxes))
        for c in corners:
            loop = np.vstack([c, c[:1]])
            ax.plot(loop[:, 0], loop[:, 1], color=color, linewidth=0.8)

    draw_boxes(gt_boxes, 'lime')
    draw_boxes(pred_boxes, 'red')
    ax.set_aspect('equal')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg_file', required=True)
    parser.add_argument('--ckpt', default=None)
    parser.add_argument('--num', type=int, default=4)
    parser.add_argument('--out_dir', default='vis_out')
    parser.add_argument('--interactive', action='store_true',
                        help='3D scene viewer (open3d window when available, '
                             'interactive matplotlib-3D otherwise; PNG export '
                             'when headless) instead of BEV PNGs')
    args = parser.parse_args()

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    import jax
    import jax.numpy as jnp

    from tmae_tpu.config import cfg_from_yaml_file
    from tmae_tpu.datasets.dataset import build_dataloader
    from tmae_tpu.models.detectors import build_detector, centerpoint_predict

    cfg = cfg_from_yaml_file(args.cfg_file)
    ds, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=1, training=False,
        runtime_cfg=cfg.RUNTIME, seed=0,
    )
    model = build_detector(cfg)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    variables = None
    infer = None
    if args.ckpt:
        from tmae_tpu.train.checkpoint import restore_checkpoint
        from tmae_tpu.train.optimization import build_optimizer
        from tmae_tpu.train.trainer import create_train_state
        batch0 = next(iter(loader))
        init_in = {k: jnp.asarray(v) for k, v in batch0.items()
                   if k != 'frame_id'}
        variables = model.init(jax.random.PRNGKey(0), init_in, train=False)
        tx, _ = build_optimizer(dict(cfg.OPTIMIZATION), 1)
        state = restore_checkpoint(args.ckpt, create_train_state(variables, tx))
        variables = {'params': state.params, 'batch_stats': state.batch_stats}

        @jax.jit
        def infer(vs, b):
            out = model.apply(vs, b, train=False)
            return centerpoint_predict(cfg, out)

    for i, batch in enumerate(loader):
        if i >= args.num:
            break
        pts = batch['points'][0][batch['point_mask'][0]]
        gt = batch.get('gt_boxes')
        gt = gt[0][batch['gt_mask'][0]][:, :7] if gt is not None else None
        pred_boxes = pred_scores = None
        if infer is not None:
            db = {k: jnp.asarray(v) for k, v in batch.items()
                  if k in ('points', 'point_mask', 'points_prev',
                           'point_mask_prev')}
            boxes, scores, labels, valid = jax.device_get(infer(variables, db))
            pred_boxes = boxes[0][valid[0]]
            pred_scores = scores[0][valid[0]]
        if args.interactive:
            import os
            from tools.visual_utils.interactive_vis import (
                draw_scenes_with_2pcs,
            )
            prv = None
            if 'points_prev' in batch:
                prv = batch['points_prev'][0][batch['point_mask_prev'][0]]
            headless = not os.environ.get('DISPLAY')
            save = (str(out_dir / f'scene_{i:04d}.png') if headless else None)
            out = draw_scenes_with_2pcs(
                pts, prv if prv is not None else pts[:0],
                gt_boxes=gt, ref_boxes=pred_boxes, ref_scores=pred_scores,
                save_path=save)
            if out:
                print('wrote', out)
            continue
        fig, ax = plt.subplots(figsize=(10, 10))
        draw_bev(ax, pts, gt, pred_boxes, pred_scores)
        ax.set_title(str(batch['frame_id'][0]))
        fig.savefig(out_dir / f'frame_{i:04d}.png', dpi=120,
                    bbox_inches='tight')
        plt.close(fig)
        print('wrote', out_dir / f'frame_{i:04d}.png')


if __name__ == '__main__':
    main()
