"""Optimizer + LR schedule builders.

Reproduces the reference's ``adam_onecycle`` recipe (``tools/train_utils/
optimization/__init__.py:11-36`` + ``learning_schedules_fastai.py:60-77``):
Adam(betas=(mom_schedule, 0.99)) with fastai true (decoupled, lr-scaled) weight
decay on all params, global-norm grad clipping, and the OneCycle schedule — cosine
anneal lr_max/div → lr_max over PCT_START, then lr_max → lr_max/div/1e4; beta1
anti-phased 0.95 → 0.85 → 0.95. Plain ``adam`` / ``sgd`` with step decay are also
provided for config parity.
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
import optax


def annealing_cos(start, end, pct):
    cos_out = jnp.cos(jnp.pi * pct) + 1
    return end + (start - end) / 2 * cos_out


def one_cycle_schedules(total_steps: int, lr_max: float, moms, div_factor: float,
                        pct_start: float):
    """Returns (lr_schedule, mom_schedule), each step → value."""
    low_lr = lr_max / div_factor
    a1 = int(total_steps * pct_start)

    def lr_fn(step):
        step = jnp.asarray(step, jnp.float32)
        p1 = jnp.clip(step / jnp.maximum(a1, 1), 0.0, 1.0)
        p2 = jnp.clip((step - a1) / jnp.maximum(total_steps - a1, 1), 0.0, 1.0)
        lr1 = annealing_cos(low_lr, lr_max, p1)
        lr2 = annealing_cos(lr_max, low_lr / 1e4, p2)
        return jnp.where(step < a1, lr1, lr2)

    def mom_fn(step):
        step = jnp.asarray(step, jnp.float32)
        p1 = jnp.clip(step / jnp.maximum(a1, 1), 0.0, 1.0)
        p2 = jnp.clip((step - a1) / jnp.maximum(total_steps - a1, 1), 0.0, 1.0)
        m1 = annealing_cos(moms[0], moms[1], p1)
        m2 = annealing_cos(moms[1], moms[0], p2)
        return jnp.where(step < a1, m1, m2)

    return lr_fn, mom_fn


def decay_step_schedule(total_steps_per_epoch: int, lr: float, decay_step_list,
                        lr_decay: float, lr_clip: float, warmup_epoch: int,
                        use_warmup: bool):
    """Step-decay schedule with optional linear warmup (reference
    ``build_scheduler`` non-onecycle path, optimization/__init__.py:39-63)."""
    decay_steps = [int(x * total_steps_per_epoch) for x in decay_step_list]

    def lr_fn(step):
        step = jnp.asarray(step, jnp.float32)
        factor = jnp.asarray(1.0, jnp.float32)
        for ds in decay_steps:
            factor = jnp.where(step >= ds, factor * lr_decay, factor)
        cur = jnp.maximum(lr * factor, lr_clip)
        if use_warmup:
            wsteps = warmup_epoch * total_steps_per_epoch
            wlr = lr * (step / jnp.maximum(wsteps, 1)) * (1 - 1.0 / 1) + lr / 1
            cur = jnp.where(step < wsteps, lr * jnp.clip(step / jnp.maximum(wsteps, 1), 1e-3, 1.0), cur)
        return cur

    return lr_fn


def build_optimizer(optim_cfg: Any, steps_per_epoch: int):
    """Returns (optax.GradientTransformation, lr_schedule_fn)."""
    name = optim_cfg['OPTIMIZER']
    total_steps = int(steps_per_epoch * optim_cfg['NUM_EPOCHS'])
    clip = float(optim_cfg.get('GRAD_NORM_CLIP', 0) or 0)
    wd = float(optim_cfg.get('WEIGHT_DECAY', 0.0))

    if name == 'adam_onecycle':
        lr_fn, mom_fn = one_cycle_schedules(
            total_steps, float(optim_cfg['LR']),
            tuple(optim_cfg.get('MOMS', (0.95, 0.85))),
            float(optim_cfg.get('DIV_FACTOR', 10)),
            float(optim_cfg.get('PCT_START', 0.4)),
        )
        adam = optax.inject_hyperparams(optax.scale_by_adam)(b1=mom_fn, b2=0.99)
        chain = []
        if clip > 0:
            chain.append(optax.clip_by_global_norm(clip))
        chain.append(adam)
        if wd > 0:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.scale_by_learning_rate(lr_fn))
        return optax.chain(*chain), lr_fn
    elif name in ('adam', 'sgd'):
        lr_fn = decay_step_schedule(
            steps_per_epoch, float(optim_cfg['LR']),
            optim_cfg.get('DECAY_STEP_LIST', []),
            float(optim_cfg.get('LR_DECAY', 0.1)),
            float(optim_cfg.get('LR_CLIP', 1e-7)),
            int(optim_cfg.get('WARMUP_EPOCH', 1)),
            bool(optim_cfg.get('LR_WARMUP', False)),
        )
        chain = []
        if clip > 0:
            chain.append(optax.clip_by_global_norm(clip))
        if name == 'adam':
            # torch Adam couples wd into the gradient
            chain.append(optax.scale_by_adam())
            if wd > 0:
                chain.append(optax.add_decayed_weights(wd))
        else:
            if wd > 0:
                chain.append(optax.add_decayed_weights(wd))
            chain.append(optax.trace(decay=float(optim_cfg.get('MOMENTUM', 0.9))))
        chain.append(optax.scale_by_learning_rate(lr_fn))
        return optax.chain(*chain), lr_fn
    raise NotImplementedError(name)
