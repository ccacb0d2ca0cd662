#!/usr/bin/env python
"""Convert a reference T-MAE torch checkpoint (.pth) into this framework's Orbax
format (the parity-evaluation path of SURVEY.md §5.4 / §7.3 item 6).

Usage:
  python tools/convert_torch_ckpt.py --torch_ckpt tmae.pth \
      --cfg_file tools/cfgs/once_models/t_mae.yaml --out converted_ckpt

Prints a key-diff report (unmatched torch keys / flax leaves kept at init),
mirroring the reference's checkpoint-compat diagnostics (tools/test.py:104-138).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--torch_ckpt', required=True)
    parser.add_argument('--cfg_file', required=True)
    parser.add_argument('--out', required=True)
    args = parser.parse_args()

    import torch

    import jax
    from tmae_tpu.config import cfg_from_yaml_file
    from tmae_tpu.models.detectors import build_detector
    from tmae_tpu.utils.torch_convert import convert_state_dict

    raw = torch.load(args.torch_ckpt, map_location='cpu')
    sd = raw.get('model_state', raw.get('state_dict', raw))
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, 'numpy')}
    params_t, stats_t, unmatched = convert_state_dict(sd)

    cfg = cfg_from_yaml_file(args.cfg_file)
    model = build_detector(cfg)
    # init a skeleton to merge into
    import jax.numpy as jnp
    P = int(cfg.RUNTIME.MAX_POINTS)
    dummy = {
        'points': jnp.zeros((1, P, 4)), 'point_mask': jnp.zeros((1, P), bool),
        'points_prev': jnp.zeros((1, P, 4)),
        'point_mask_prev': jnp.zeros((1, P), bool),
    }
    rngs = {'params': jax.random.PRNGKey(0)}
    if cfg.MODEL.NAME in ('TMAE', 'GDMAE'):
        rngs['mae_mask'] = jax.random.PRNGKey(1)
    variables = jax.eval_shape(lambda: model.init(rngs, dummy, train=False))
    variables = jax.tree.map(
        lambda s: np.zeros(s.shape, s.dtype), variables
    )

    flat_init = flatten(variables['params'])
    flat_conv = flatten(params_t)
    merged = dict(flat_init)
    used, shape_mismatch = [], []
    for k, v in flat_conv.items():
        if k in flat_init:
            if np.shape(v) == np.shape(flat_init[k]):
                merged[k] = np.asarray(v)
                used.append(k)
            else:
                shape_mismatch.append((k, np.shape(v), np.shape(flat_init[k])))
    missing = [k for k in flat_init if k not in flat_conv]

    print(f'converted {len(used)}/{len(flat_init)} param leaves')
    for k, s1, s2 in shape_mismatch:
        print('SHAPE MISMATCH', '/'.join(k), s1, 'vs', s2)
    for k in missing[:40]:
        print('kept at init:', '/'.join(k))
    for k in unmatched[:40]:
        print('unmatched torch key:', k)

    def unflatten(flat):
        tree = {}
        for k, v in flat.items():
            d = tree
            for p in k[:-1]:
                d = d.setdefault(p, {})
            d[k[-1]] = v
        return tree

    out_vars = {
        'params': unflatten(merged),
        'batch_stats': stats_t,
        'meta': {'source': str(args.torch_ckpt)},
    }
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(Path(args.out).resolve(), out_vars, force=True)
    ckptr.wait_until_finished()
    print('saved', args.out)


if __name__ == '__main__':
    main()
