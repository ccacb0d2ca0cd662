"""Common NN building blocks: masked batch norm, masked "sparse" convolutions,
MLP stacks. These are the TPU equivalents of the reference's BatchNorm1d-over-sparse
-features and spconv SubMConv2d / SparseConv2d layers (DESIGN.md §3).
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

BN_EPS = 1e-3
BN_MOMENTUM = 0.01  # torch momentum 0.01 → flax momentum 0.99
CONV_DTYPE = jnp.bfloat16  # matmul/conv compute dtype (params stay f32)
# inter-layer activation dtype on the dense BEV carrier. bf16 halves the
# bandwidth of every elementwise/BN/pad pass between convs and encoder
# kernels; BN statistics and normalization math stay f32 (upcast/downcast
# fuse into the surrounding elementwise chain, so no extra HBM pass).
CARRIER_DTYPE = jnp.bfloat16


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid elements of ``x [..., C]`` given ``mask [...]``.

    Equivalent to the reference's ``nn.BatchNorm1d(eps=1e-3, momentum=0.01)`` applied
    to the packed ``[N_active, C]`` sparse features (``spt_backbone.py:277``). Under
    data-parallel jit the statistics are global-batch (sync-BN semantics).
    """

    use_running_average: bool | None = None
    momentum: float = 1.0 - BN_MOMENTUM
    epsilon: float = BN_EPS

    @nn.compact
    def __call__(self, x, mask, use_running_average: bool | None = None):
        use_ra = nn.merge_param(
            'use_running_average', self.use_running_average, use_running_average
        )
        C = x.shape[-1]
        ra_mean = self.variable('batch_stats', 'mean', lambda: jnp.zeros((C,)))
        ra_var = self.variable('batch_stats', 'var', lambda: jnp.ones((C,)))
        scale = self.param('scale', nn.initializers.ones, (C,))
        bias = self.param('bias', nn.initializers.zeros, (C,))

        in_dtype = x.dtype
        x = x.astype(jnp.float32)  # stats + normalization in f32
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            m = mask.astype(jnp.float32)[..., None]
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            red = tuple(range(x.ndim - 1))
            mean = jnp.sum(x * m, axis=red) / cnt
            var = jnp.sum(jnp.square(x - mean) * m, axis=red) / cnt
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                # unbiased variance for running stats, like torch
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * unbiased
                )
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return jnp.where(mask[..., None], y, 0.0).astype(in_dtype)


class BatchNorm2d(nn.Module):
    """Dense BN over [B, H, W, C] (reference nn.BatchNorm2d on dense BEV maps)."""

    use_running_average: bool | None = None
    momentum: float = 1.0 - BN_MOMENTUM
    epsilon: float = BN_EPS

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        use_ra = nn.merge_param(
            'use_running_average', self.use_running_average, use_running_average
        )
        in_dtype = x.dtype
        return nn.BatchNorm(
            use_running_average=use_ra,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis_name=None,
        )(x.astype(jnp.float32)).astype(in_dtype)


class ConvBNReLU(nn.Module):
    """Conv2d(bias=False) + BN + ReLU on dense NHWC maps (reference post-act dense
    blocks, e.g. ``sst_bev_backbone.py:14-41``)."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    padding: int | None = None
    epsilon: float = BN_EPS
    momentum: float = 1.0 - BN_MOMENTUM
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        pad = self.padding if self.padding is not None else self.dilation * (
            self.kernel // 2
        )
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias, dtype=CONV_DTYPE,
        )(x).astype(CARRIER_DTYPE)
        x = BatchNorm2d(epsilon=self.epsilon, momentum=self.momentum)(
            x, use_running_average=not train
        )
        return nn.relu(x)


class _DeconvParams(nn.Module):
    """Owns the deconv kernel under the same param path as ``nn.ConvTranspose``
    ('ConvTranspose_0/kernel'), so checkpoints/converters are unaffected by the
    matmul execution below."""

    features: int
    cin: int
    stride: int

    @nn.compact
    def __call__(self):
        return self.param(
            'kernel', nn.initializers.lecun_normal(),
            (self.stride, self.stride, self.cin, self.features))


class DeconvBNReLU(nn.Module):
    """ConvTranspose2d(k=s, bias=False) + BN + ReLU (reference deblocks,
    ``SiamWCA.py:519-535``). stride==1 degenerates to a 1x1 conv, as in torch.

    Execution: with k == s every output cell receives exactly ONE kernel tap,
    so the deconv is a per-cell matmul at the LOW resolution
    (``[B,H,W,Cin] @ [Cin, s*s*Cout]``) followed by a depth-to-space reshape —
    MXU-shaped, unlike XLA's general transposed-conv lowering (measured ~2x on
    the 468² pyramid fuse). Numerics match ``nn.ConvTranspose`` exactly (which
    flips the kernel; hence the ``[::-1, ::-1]``)."""

    features: int
    stride: int

    @nn.compact
    def __call__(self, x, train: bool):
        s = self.stride
        B, H, W, cin = x.shape
        K = _DeconvParams(self.features, cin, s, name='ConvTranspose_0')()
        xc = x.astype(CONV_DTYPE)
        if s == 1:
            y = jnp.dot(xc, K[0, 0].astype(CONV_DTYPE),
                        preferred_element_type=jnp.float32)
        else:
            kmat = jnp.transpose(K[::-1, ::-1], (2, 0, 1, 3)).reshape(
                cin, s * s * self.features)
            # cast BEFORE the depth-to-space relayout: the transpose is a
            # full-map HBM pass at the upsampled size, half the bytes in bf16
            y = jnp.dot(xc, kmat.astype(CONV_DTYPE),
                        preferred_element_type=jnp.float32)
            y = y.astype(CARRIER_DTYPE).reshape(B, H, W, s, s, self.features)
            y = y.transpose(0, 1, 3, 2, 4, 5).reshape(
                B, H * s, W * s, self.features)
        x = y.astype(CARRIER_DTYPE)
        x = BatchNorm2d()(x, use_running_average=not train)
        return nn.relu(x)


class LinearBNReLU(nn.Module):
    """Linear(bias=False) + masked BN + ReLU over point/voxel lists — the reference
    ``make_fc_layers_GN`` stack (``network_utils.py:25-40``, which despite its name
    uses BatchNorm1d with torch DEFAULT eps/momentum, unlike the spconv blocks)."""

    features: int
    epsilon: float = 1e-5
    momentum: float = 0.9  # torch default momentum 0.1

    @nn.compact
    def __call__(self, x, mask, train: bool):
        x = nn.Dense(self.features, use_bias=False)(x)
        x = MaskedBatchNorm(epsilon=self.epsilon, momentum=self.momentum)(
            x, mask, use_running_average=not train
        )
        return nn.relu(x)


class _Conv3x3Params(nn.Module):
    """Owns a 3x3 conv kernel under the same param path as ``nn.Conv``
    ('Conv_0/kernel') so dense and occupancy-aware paths share checkpoints."""

    features: int
    cin: int

    @nn.compact
    def __call__(self):
        return self.param(
            'kernel', nn.initializers.lecun_normal(),
            (3, 3, self.cin, self.features))


class SubMConvBlock(nn.Module):
    """Submanifold 3x3 conv on a voxel grid: conv outputs masked to the input
    active set, + masked BN + ReLU (reference ``post_act_block(...,
    conv_type='subm', dim=2)``, spconv_utils.py:37-56).

    With a compaction ``plan`` (idx [B, cap, 2] window coords + qmask
    [B, cap, w*w]), the conv runs the occupancy-aware Pallas kernel over the
    occupied windows only (ops/sparse_conv.py); occupied windows beyond the
    plan cap are zeroed (flagged by the stage overflow counter)."""

    features: int

    @nn.compact
    def __call__(self, grid, occ, train: bool, plan=None):
        """grid [B, H, W, C] (zeros at inactive), occ [B, H, W] bool."""
        if plan is not None:
            from ..ops.sparse_conv import subm_conv3x3

            idx, qmask, window = plan
            kernel = _Conv3x3Params(self.features, grid.shape[-1],
                                    name='Conv_0')()
            x = subm_conv3x3(
                grid.astype(CONV_DTYPE), idx, qmask, kernel.astype(CONV_DTYPE),
                jnp.zeros((self.features,), jnp.float32),
                (grid.shape[1], grid.shape[2]), window,
            ).astype(CARRIER_DTYPE)
        else:
            x = nn.Conv(self.features, (3, 3), padding='SAME', use_bias=False,
                        dtype=CONV_DTYPE)(grid).astype(CARRIER_DTYPE)
            x = jnp.where(occ[..., None], x, jnp.zeros((), x.dtype))
        x = MaskedBatchNorm()(x, occ, use_running_average=not train)
        return nn.relu(x)


class StridedSparseConvBlock(nn.Module):
    """SparseConv2d(k=3, s=2, p=1) + BN + ReLU in the masked-dense formulation.
    The caller supplies the precomputed output active set (``downsample_coords``)."""

    features: int

    @nn.compact
    def __call__(self, grid, occ_out, train: bool):
        """grid [B, H, W, C] → [B, ceil(H/2), ceil(W/2), F], masked to occ_out."""
        H = grid.shape[1]
        # torch/spconv output size (H + 2*1 - 3)//2 + 1 == (H+1)//2; flax 'SAME'
        # with stride 2 gives ceil(H/2) == (H+1)//2 but anchors the kernel
        # differently; use explicit padding (1, 1) to match.
        x = nn.Conv(
            self.features, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            use_bias=False, dtype=CONV_DTYPE,
        )(grid).astype(CARRIER_DTYPE)
        x = jnp.where(occ_out[..., None], x, jnp.zeros((), x.dtype))
        x = MaskedBatchNorm()(x, occ_out, use_running_average=not train)
        return nn.relu(x)


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics and affine params (reference
    ``network_utils.FrozenBatchNorm``): normalizes with stored mean/var, no
    updates; used when freezing pretrained branches."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.variable('batch_stats', 'scale', lambda: jnp.ones((C,)))
        bias = self.variable('batch_stats', 'bias', lambda: jnp.zeros((C,)))
        mean = self.variable('batch_stats', 'mean', lambda: jnp.zeros((C,)))
        var = self.variable('batch_stats', 'var', lambda: jnp.ones((C,)))
        return (x - mean.value) * jax.lax.rsqrt(
            var.value + self.epsilon
        ) * scale.value + bias.value


def freeze_param_labels(params, frozen_prefixes):
    """Label tree for optax.multi_transform: 'frozen' for any leaf whose path
    starts with one of ``frozen_prefixes`` (the reference ``freeze()`` /
    ``--pretrained_model`` freezing role, detector3d_template.py:30-36)."""
    import flax.traverse_util as tu
    flat = tu.flatten_dict(params)
    labels = {
        k: ('frozen' if any(k[0] == p or '/'.join(k).startswith(p)
                            for p in frozen_prefixes) else 'trainable')
        for k in flat
    }
    return tu.unflatten_dict(labels)


class DeformConvBNReLU(nn.Module):
    """Modulated deformable conv block (DCNv2): a plain conv predicts per-tap
    offsets and modulation (zero-initialized, sigmoid(0)=0.5 like the CUDA
    module), then ops/dcn.deform_conv2d samples and contracts. Used by the
    DLA-style image backbone of the GraphRCNN fusion variant
    (reference pcdet/ops/dcn)."""

    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        from ..ops.dcn import deform_conv2d

        K = self.kernel * self.kernel
        pred = nn.Conv(
            3 * K, (self.kernel, self.kernel), strides=self.stride,
            padding='SAME', kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name='conv_offset_mask',
        )(x)
        offset = pred[..., :2 * K]
        mask = jax.nn.sigmoid(pred[..., 2 * K:])
        weight = self.param(
            'kernel', nn.initializers.he_normal(),
            (self.kernel, self.kernel, x.shape[-1], self.features),
        )
        pad = (self.kernel - 1) // 2
        y = deform_conv2d(x, offset, mask, weight, stride=self.stride,
                          padding=pad)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
        )(y)
        return nn.relu(y)
