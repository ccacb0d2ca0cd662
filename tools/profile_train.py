#!/usr/bin/env python
"""Full-size train-step throughput on the attached accelerator (finetune by
default; ``--model mae`` profiles the TMAE pretrain step).

Measures the jitted CenterPoint+SiamWCA training step (forward + fused Pallas
backward + one-cycle AdamW update) at the ONCE 468x468 grid over several batch
sizes, scan-chained so relay overheads cancel (state feeds the next step).
Prints steps/sec + projected epoch time vs the reference recipe
(4xA100, bs 6/GPU, 80 epochs, ~5k samples/epoch-equivalent; once_train.sh)."""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument('--model', choices=['finetune', 'mae'], default='finetune')
    ap.add_argument('--batches', type=int, nargs='+', default=[1, 2, 4])
    ap.add_argument('--set', dest='set_cfgs', nargs='+', default=None,
                    help='config overrides, e.g. RUNTIME.VFE_COMPUTE bf16')
    ap.add_argument('--mode', choices=['step', 'grad', 'fwd'],
                    default='step',
                    help='step = full train step; grad = fwd+bwd only; '
                         'fwd = loss forward only (decomposition timing)')
    cli = ap.parse_args()

    import jax

    jax.config.update('jax_compilation_cache_dir', str(REPO / '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    import numpy as np

    from tmae_tpu.config import cfg_from_yaml_file
    from tmae_tpu.datasets.dataset import build_dataloader
    from tmae_tpu.models.detectors import build_detector, centerpoint_loss
    from tmae_tpu.train.optimization import build_optimizer
    from tmae_tpu.train.trainer import create_train_state, make_train_step

    from tmae_tpu.models.detectors import tmae_loss

    yaml_name = ('t_mae_ssl_synth.yaml' if cli.model == 'mae'
                 else 't_mae_synth.yaml')
    cfg = cfg_from_yaml_file(REPO / 'tools/cfgs/once_models' / yaml_name)
    if cli.set_cfgs:
        from tmae_tpu.config import cfg_from_list
        cfg = cfg_from_list(cli.set_cfgs, cfg)
    for B in cli.batches:
        _, loader = build_dataloader(
            cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=B, training=True,
            runtime_cfg=cfg.RUNTIME, seed=0,
        )
        batch = next(iter(loader))
        dev = {k: jnp.asarray(v) for k, v in batch.items()
               if k != 'frame_id'}
        model = build_detector(cfg)
        is_mae = cli.model == 'mae'
        init_rngs = {'params': jax.random.PRNGKey(0)}
        if is_mae:
            init_rngs['mae_mask'] = jax.random.PRNGKey(1)
        variables = jax.jit(lambda b: model.init(init_rngs, b, train=False))(
            dev)
        tx, _ = build_optimizer(dict(cfg.OPTIMIZATION), steps_per_epoch=100)
        state = create_train_state(variables, tx)
        if is_mae:
            loss_fn = lambda out, b: tmae_loss(cfg, out, b)
            step = make_train_step(model, loss_fn, tx, rng_names=('mae_mask',))
        else:
            loss_fn = lambda out, b: centerpoint_loss(cfg, out, b)
            step = make_train_step(model, loss_fn, tx)

        mode = getattr(cli, 'mode', 'step')
        if mode == 'step':
            @jax.jit
            def steps(state, dev, n=4):
                def body(s, i):
                    s2, metrics = step(s, dev, jax.random.fold_in(
                        jax.random.PRNGKey(1), i))
                    return s2, metrics['loss']
                s, losses = jax.lax.scan(body, state, jnp.arange(n))
                return s, losses
        else:
            # decomposition modes: 'fwd' = loss forward only; 'grad' =
            # fwd + bwd (no optimizer update). Same scan-chained timing.
            def loss_of(params_etc, b, rng):
                var = dict(variables)
                var['params'] = params_etc
                rngs = {'mae_mask': rng} if is_mae else {}
                out, _ = model.apply(var, b, train=True, rngs=rngs,
                                     mutable=['batch_stats', 'intermediates'])
                loss, _ = loss_fn(out, b)
                return loss

            @jax.jit
            def steps(state, dev, n=4):
                def body(c, i):
                    rng = jax.random.fold_in(jax.random.PRNGKey(1), i)
                    p = jax.tree.map(lambda a, cc=c: a + cc * 1e-30,
                                     state.params)
                    if mode == 'fwd':
                        val = loss_of(p, dev, rng)
                    else:
                        # consume the gradients or XLA dead-code-eliminates
                        # the whole backward (observed: 'grad' == 'fwd' time)
                        val, g = jax.value_and_grad(loss_of)(p, dev, rng)
                        gsum = sum(jnp.vdot(a, a)
                                   for a in jax.tree.leaves(g))
                        val = val + gsum.real * 1e-30
                    return val * 1e-30, val
                s, losses = jax.lax.scan(body, jnp.float32(0.0),
                                         jnp.arange(n))
                return state, losses

        try:
            t0 = time.time()
            s1, losses = steps(state, dev)
            _ = jax.device_get(losses)
            compile_s = time.time() - t0
            t0 = time.time()
            s2, losses = steps(s1, dev)
            _ = jax.device_get(losses)
            t4 = time.time() - t0
            per_step = t4 / 4
            print(f'B={B}: {per_step*1e3:8.1f} ms/step '
                  f'({B/per_step:.2f} frames/s; compile {compile_s:.0f}s; '
                  f'losses {np.asarray(losses).round(1)})', flush=True)
        except Exception as e:  # OOM at larger B is expected on 16 GB v5e
            print(f'B={B}: failed ({type(e).__name__}: {str(e)[:200]})',
                  flush=True)
            break


if __name__ == '__main__':
    main()
