"""End-to-end name-mapping test of the torch→JAX checkpoint converter: a
synthetic reference-named state dict (mini dims) must land on the real flax
parameter tree of the CenterPoint model with shapes matching."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.tiny_cfg import tiny_cfg, synth_batch
from tmae_tpu.models.detectors import build_detector
from tmae_tpu.utils.torch_convert import convert_state_dict


def flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def make_reference_state_dict(rng):
    """Torch-named tensors for the tiny finetune config (tiny_cfg dims:
    vfe mlps [8,16], sst d_model (16,32,32), NUM_BLOCKS 1, bev 16ch,
    head shared 16)."""
    sd = {}
    r = lambda *s: rng.randn(*s).astype(np.float32)

    def bn(prefix, c):
        sd[f'{prefix}.weight'] = r(c)
        sd[f'{prefix}.bias'] = r(c)
        sd[f'{prefix}.running_mean'] = r(c)
        sd[f'{prefix}.running_var'] = np.abs(r(c)) + 0.5

    # VFE: Linear(10→8) BN Linear(8→16) BN
    sd['vfe.dvfe_mlps.0.0.weight'] = r(8, 10)
    bn('vfe.dvfe_mlps.0.1', 8)
    sd['vfe.dvfe_mlps.0.3.weight'] = r(16, 8)
    bn('vfe.dvfe_mlps.0.4', 16)

    def encoder_layer(prefix, c, ff, cross):
        attn = 'cross_attn' if cross else 'self_attn'
        sd[f'{prefix}.win_attn.{attn}.in_proj_weight'] = r(3 * c, c)
        sd[f'{prefix}.win_attn.{attn}.in_proj_bias'] = r(3 * c)
        sd[f'{prefix}.win_attn.{attn}.out_proj.weight'] = r(c, c)
        sd[f'{prefix}.win_attn.{attn}.out_proj.bias'] = r(c)
        sd[f'{prefix}.win_attn.{attn}.tau'] = np.ones((1, 1, 1), np.float32)
        sd[f'{prefix}.linear1.weight'] = r(ff, c)
        sd[f'{prefix}.linear1.bias'] = r(ff)
        sd[f'{prefix}.linear2.weight'] = r(c, ff)
        sd[f'{prefix}.linear2.bias'] = r(c)
        for n in ('norm1', 'norm2'):
            sd[f'{prefix}.{n}.weight'] = r(c)
            sd[f'{prefix}.{n}.bias'] = r(c)

    dims = [(16, 32, 16), (32, 64, 16), (32, 64, 32)]  # (d_model, ff, in_ch)
    for bi, (c, ff, cin) in enumerate(dims):
        base = f'backbone_3d.sst_blocks.{bi}'
        if bi > 0:  # stride-2 blocks have conv_down (spconv 2.x OKKI layout)
            sd[f'{base}.conv_down.0.weight'] = r(c, 3, 3, cin)
            bn(f'{base}.conv_down.1', c)
        for li in range(2):
            encoder_layer(f'{base}.encoder_blocks.0.encoder_list.{li}', c, ff,
                          cross=False)
        sd[f'{base}.conv_out.0.weight'] = r(c, 3, 3, c)
        bn(f'{base}.conv_out.1', c)
        wbase = f'backbone_3d.wca_blocks.{bi}'
        for li in range(2):
            encoder_layer(f'{wbase}.encoder_blocks.0.encoder_list.{li}', c, ff,
                          cross=True)
        sd[f'{wbase}.conv_out.0.weight'] = r(c, 3, 3, c)
        bn(f'{wbase}.conv_out.1', c)

    # deblocks + fuse conv (upsample filters 16 each → concat 48 → out 16)
    for i, (cin, st) in enumerate([(16, 1), (32, 2), (32, 4)]):
        sd[f'backbone_3d.deblocks.{i}.0.weight'] = r(cin, 16, st, st)
        bn(f'backbone_3d.deblocks.{i}.1', 16)
    sd['backbone_3d.conv_out.0.weight'] = r(16, 48, 3, 3)
    bn('backbone_3d.conv_out.1', 16)

    # BEV backbone (2 convs of 16)
    for i in range(2):
        sd[f'backbone_2d.conv_layer.{i}.0.weight'] = r(16, 16, 3, 3)
        bn(f'backbone_2d.conv_layer.{i}.1', 16)

    # CenterHead
    sd['dense_head.shared_conv.0.weight'] = r(16, 16, 3, 3)
    sd['dense_head.shared_conv.0.bias'] = r(16)
    bn('dense_head.shared_conv.1', 16)
    heads = {'center': 2, 'center_z': 1, 'dim': 3, 'rot': 2, 'hm': 5}
    for name, out_c in heads.items():
        base = f'dense_head.heads_list.0.{name}'
        sd[f'{base}.0.0.weight'] = r(16, 16, 3, 3)
        sd[f'{base}.0.0.bias'] = r(16)
        bn(f'{base}.0.1', 16)
        sd[f'{base}.1.weight'] = r(out_c, 16, 3, 3)
        sd[f'{base}.1.bias'] = r(out_c)
    return sd


def test_convert_covers_model_tree():
    rng = np.random.RandomState(0)
    sd = make_reference_state_dict(rng)
    params_t, stats_t, unmatched = convert_state_dict(sd)
    assert unmatched == [], unmatched[:10]

    cfg = tiny_cfg(mae=False)
    model = build_detector(cfg)
    batch = {k: jnp.asarray(v) for k, v in
             synth_batch(np.random.RandomState(0)).items()}
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=False)
    )
    flat_init = flatten(
        jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                     variables)['params']
    )
    flat_conv = flatten(params_t)
    matched = 0
    mismatched = []
    for k, v in flat_conv.items():
        if k in flat_init:
            if np.shape(v) == np.shape(flat_init[k]):
                matched += 1
            else:
                mismatched.append((k, np.shape(v), np.shape(flat_init[k])))
        else:
            mismatched.append((k, np.shape(v), 'NOT IN MODEL'))
    assert not mismatched, mismatched[:8]
    # every converted leaf lands in the model; coverage of the model tree is
    # high (tau/bn stats etc. aside, the deconv/head/encoder weights all map)
    assert matched >= 0.9 * len(flat_conv)
    cover = matched / len(flat_init)
    assert cover > 0.95, f'only {cover:.0%} of model params covered'
