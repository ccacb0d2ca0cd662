"""Sorted-segment reductions as a Pallas segmented-scan kernel.

TPU scatter cost is row-count-bound (~1.6 ms per 131k-row ``segment_max``
pass at the production point cap, tools/profile_vfe.py) regardless of how
wide the rows are. When the host input pipeline ships points SORTED by
pillar slot (``ops.voxelize.voxelize_host(sort_points=True)``,
RUNTIME.HOST_VOXELIZE_SORT), the same reduction becomes:

  1. an in-VMEM segmented running max over the sorted rows — log2(BP)
     shift+compare steps per block, with a (last slot, running row) carry
     across the sequentially-executed grid; then
  2. one cheap 32k-row gather of each segment's LAST row (the host ships
     ``seg_ends``).

This replaces the reference's ``torch_scatter.scatter_max`` pooling
(``pcdet/models/backbones_3d/vfe/temporal_dyn_vfe.py:55-125``) on the
serving path; the scatter-based :func:`ops.voxelize.segment_max` remains
the train-path (differentiable) and CPU implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False


def set_interpret(flag: bool):
    global _INTERPRET
    _INTERPRET = bool(flag)


def _use_pallas():
    return _INTERPRET or jax.default_backend() == 'tpu'


def _scan_kernel(seg_ref, feat_ref, out_ref, carry_slot, carry_max):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_slot[0] = -1
        carry_max[...] = jnp.full_like(carry_max[...], -jnp.inf)

    s = seg_ref[...]   # [BP, 1] int32 (non-decreasing globally)
    x = feat_ref[...]  # [BP, C]
    # merge the previous block's running max into this block's rows of the
    # same (possibly split) segment
    x = jnp.where(s == carry_slot[0], jnp.maximum(x, carry_max[...]), x)
    bp = x.shape[0]
    k = 1
    while k < bp:
        xs = jnp.concatenate(
            [jnp.full((k, x.shape[1]), -jnp.inf, x.dtype), x[:-k]], axis=0)
        ss = jnp.concatenate([jnp.full((k, 1), -2, s.dtype), s[:-k]], axis=0)
        x = jnp.where(s == ss, jnp.maximum(x, xs), x)
        k *= 2
    out_ref[...] = x
    carry_slot[0] = s[bp - 1, 0]
    carry_max[...] = x[bp - 1:bp]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def sorted_segment_max(feat: jnp.ndarray, seg: jnp.ndarray,
                       seg_ends: jnp.ndarray, seg_mask: jnp.ndarray,
                       num_segments: int, block: int = 1024):
    """Per-segment max over rows sorted by segment id.

    feat [B, P, C]; invalid rows must either carry an OUT-OF-RANGE segment id
    (>= num_segments, e.g. the host voxelizer's OOB slot V — they then form
    trailing segments that no ``seg_ends`` entry gathers) OR hold ``-inf``.
    seg [B, P] non-decreasing per batch row, seg_ends [B, V] index of each
    segment's last row (0 for empty), seg_mask [B, V] segment-present flags.
    Returns [B, V, C] with 0 for empty segments (``segment_max`` semantics).
    """
    B, P, C = feat.shape
    if not _use_pallas() or P % block:
        from .voxelize import segment_max
        return jnp.where(seg_mask[..., None],
                         segment_max(feat, seg, num_segments), 0.0)

    scan = pl.pallas_call(
        _scan_kernel,
        grid=(P // block,),
        in_specs=[
            pl.BlockSpec((block, 1), lambda i: (i, 0)),
            pl.BlockSpec((block, C), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((P, C), feat.dtype),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32),
                        pltpu.VMEM((1, C), feat.dtype)],
        interpret=_INTERPRET,
    )

    def one(f, s, e, m):
        ends = scan(s[:, None].astype(jnp.int32), f)
        out = jnp.take(ends, jnp.clip(e, 0, P - 1), axis=0)  # [V, C]
        return jnp.where(m[..., None], out, 0.0)

    return jax.vmap(one)(feat, seg, seg_ends[..., :num_segments],
                         seg_mask[..., :num_segments])


def _ssm_fwd(feat, seg, seg_ends, seg_mask, num_segments, block):
    out = sorted_segment_max(feat, seg, seg_ends, seg_mask, num_segments,
                             block)
    return out, (feat, seg, seg_ends, seg_mask, out)


def _ssm_bwd(num_segments, block, res, g):
    """Gradient matching ``segment_max``'s convention (even split among
    tied maxima — probed against jax's vjp). Lets TRAINING use the sorted
    fast path: the forward's scatter-max is gone; the backward costs the
    same eq-compare + segment-sum + gathers the scatter path's vjp does."""
    import numpy as np

    from .voxelize import segment_sum

    feat, seg, seg_ends, seg_mask, out = res
    safe = jnp.minimum(seg, num_segments - 1)[..., None].astype(jnp.int32)
    valid_p = (seg < num_segments)[..., None]
    out_at = jnp.take_along_axis(out, safe, axis=1)        # [B, P, C]
    eq = (feat == out_at) & valid_p
    cnt = segment_sum(eq.astype(jnp.float32), seg, num_segments)
    cnt_at = jnp.take_along_axis(cnt, safe, axis=1)
    g = jnp.where(seg_mask[..., :num_segments, None], g, 0)
    g_at = jnp.take_along_axis(g, safe, axis=1)
    dfeat = jnp.where(eq, g_at / jnp.maximum(cnt_at, 1.0), 0.0)
    z = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (dfeat.astype(feat.dtype), z(seg), z(seg_ends), z(seg_mask))


sorted_segment_max.defvjp(_ssm_fwd, _ssm_bwd)
