"""Conv–BatchNorm folding (reference ``pcdet/models/model_utils/fusion_utils
.py``, applied by ``tools/test.py --fuse_conv_bn`` via eval_utils.py:44-45).

Under XLA this is a numerical no-op for speed — the BN affine is fused into
the convolution epilogue at compile time — so the utility exists for API
parity and for exporting fused parameter trees (e.g. to serve without
batch_stats).

Folding rule for y = BN(conv(x)):  s = scale / sqrt(var + eps)
    kernel' = kernel * s   (output-channel axis = last)
    bias'   = bias - mean * s   (+ conv_bias * s when the conv has one)
after which BN is reset to the identity (scale=1, bias'=..., mean=0,
var=1-eps).
"""

from __future__ import annotations

import numpy as np

_CONV_PREFIXES = ('Conv_', 'ConvTranspose_', 'Dense_')
_BN2D_PREFIX = 'BatchNorm2d_'
_MASKED_BN_PREFIX = 'MaskedBatchNorm_'


def _is_conv_scope(v):
    return isinstance(v, dict) and 'kernel' in v


def _fuse_pair(conv_p, bn_scale, bn_bias, bn_mean, bn_var, eps):
    s = np.asarray(bn_scale) / np.sqrt(np.asarray(bn_var) + eps)
    kernel = np.asarray(conv_p['kernel']) * s  # broadcast on last axis
    bias = np.asarray(bn_bias) - np.asarray(bn_mean) * s
    if 'bias' in conv_p:
        bias = bias + np.asarray(conv_p['bias']) * s
    new_conv = dict(conv_p)
    new_conv['kernel'] = kernel.astype(np.asarray(conv_p['kernel']).dtype)
    identity_bn = {
        'scale': np.ones_like(np.asarray(bn_scale)),
        'bias': bias.astype(np.asarray(bn_bias).dtype),
    }
    identity_stats = {
        'mean': np.zeros_like(np.asarray(bn_mean)),
        'var': np.ones_like(np.asarray(bn_var)) * (1.0 - eps),
    }
    return new_conv, identity_bn, identity_stats


def fuse_conv_bn(params, batch_stats, eps_fn=None):
    """Fold BN into the preceding conv wherever a scope holds exactly one
    conv-like child (``Conv_*``/``ConvTranspose_*``/``Dense_*`` or a bare
    ``kernel`` param, as in the sparse conv blocks) and one BN child.

    eps_fn(path_tuple) → epsilon; defaults to 1e-3 (the spconv-family value)
    except 1e-5 when the BN is a MaskedBatchNorm directly beside a Dense
    (the LinearBNReLU torch-default stacks). Returns (params', batch_stats').
    """
    if eps_fn is None:
        def eps_fn(path, bn_key, conv_key):
            if (bn_key.startswith(_MASKED_BN_PREFIX)
                    and conv_key.startswith('Dense_')):
                return 1e-5
            return 1e-3

    def walk(p, s, path):
        if not isinstance(p, dict):
            return p, s
        p = dict(p)
        s = dict(s) if isinstance(s, dict) else {}
        keys = list(p.keys())
        conv_key = None
        for k in keys:
            if (any(k.startswith(c) for c in _CONV_PREFIXES)
                    and _is_conv_scope(p[k])):
                conv_key = k
        if conv_key is None and 'kernel' in p:
            conv_key = '.'  # the scope itself holds the conv params
        bn_key = None
        for k in keys:
            if k.startswith(_BN2D_PREFIX) or k.startswith(_MASKED_BN_PREFIX):
                bn_key = k
        if conv_key is not None and bn_key is not None and bn_key in s:
            conv_p = p if conv_key == '.' else p[conv_key]
            if bn_key.startswith(_BN2D_PREFIX):
                bn_p = p[bn_key]['BatchNorm_0']
                bn_s = s[bn_key]['BatchNorm_0']
            else:
                bn_p = p[bn_key]
                bn_s = s[bn_key]
            eps = eps_fn(path, bn_key, conv_key)
            new_conv, new_bn, new_stats = _fuse_pair(
                conv_p, bn_p['scale'], bn_p['bias'], bn_s['mean'],
                bn_s['var'], eps,
            )
            if conv_key == '.':
                p.update(new_conv)
            else:
                p[conv_key] = new_conv
            if bn_key.startswith(_BN2D_PREFIX):
                p[bn_key] = {'BatchNorm_0': new_bn}
                s[bn_key] = {'BatchNorm_0': new_stats}
            else:
                p[bn_key] = new_bn
                s[bn_key] = new_stats
        for k in keys:
            if k in (conv_key, bn_key):
                continue
            if isinstance(p.get(k), dict):
                p[k], sk = walk(p[k], s.get(k, {}), path + (k,))
                if sk:
                    s[k] = sk
        return p, s

    return walk(dict(params), dict(batch_stats), ())
