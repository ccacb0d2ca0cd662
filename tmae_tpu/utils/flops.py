"""Analytic FLOPs accounting for the T-MAE forward graph.

Extends the reference's inference-speed harness (which reports only ms/forward,
``tools/eval_utils/eval_utils.py:57-77``) with the FLOP counts needed to compute
achieved MFU per stage. XLA's ``cost_analysis`` cannot see inside Pallas custom
calls (the encoder's hot kernels), so the counts here are analytic, derived from
the config exactly as the kernels dispatch them:

* matmul/conv FLOPs = 2 * MACs (multiply + add);
* encoder-layer FLOPs are counted at the STATIC bucket caps — the work the
  hardware actually executes, padding included (utilization accounting), with
  the per-bucket token count as the attention context length;
* elementwise/BN/softmax work is omitted (<1% of total, bandwidth- not
  FLOP-bound).

Peak numbers: TPU v5e (v5 lite) ≈ 197 TFLOP/s bf16 / 98.5 f32.
"""

from __future__ import annotations

import math

V5E_PEAK_BF16 = 197e12
V5E_PEAK_F32 = 98.5e12

GIGA = 1e9


def _conv2d(h, w, cin, cout, k=3, batch=1):
    return 2.0 * batch * h * w * k * k * cin * cout


def _grid_hw(cfg):
    pr = cfg.DATA_CONFIG.POINT_CLOUD_RANGE
    vs = getattr(cfg.DATA_CONFIG, 'VOXEL_SIZE', None)
    if vs is None:
        # the processor config carries it; ONCE/Waymo T-MAE use 0.32 m pillars
        for p in cfg.DATA_CONFIG.get('DATA_PROCESSOR', []):
            if 'VOXEL_SIZE' in p:
                vs = p['VOXEL_SIZE']
                break
    if vs is None:
        vs = [0.32, 0.32, 8.0]
    W = int(round((pr[3] - pr[0]) / vs[0]))
    H = int(round((pr[4] - pr[1]) / vs[1]))
    return H, W


def encoder_layer_flops(c, ffn, bucket_tokens, cross=False):
    """One windowed encoder layer over packed buckets.

    ``bucket_tokens``: list of (n_windows, tokens_per_window). Projections:
    q,k,v,out = 4 matmuls of C x C per token (cross-attention has the same
    count, q on the cur tokens and k/v on the prev tokens of the SAME
    windows, so token counts match). FFN: C->F->C. Attention: QK^T and AV,
    2 * 2 * T * C per query token with T keys."""
    total = 0.0
    for n_w, t in bucket_tokens:
        tok = n_w * t
        proj = 8.0 * c * c * tok
        ffn_f = 4.0 * c * ffn * tok
        attn = 4.0 * t * c * tok
        total += proj + ffn_f + attn
    return total


def _stage_buckets(rt, i):
    """(n_windows, tokens) dispatched per sample for pyramid stage i, from the
    RUNTIME compaction caps (the static shapes the kernels run at)."""
    caps = [int(v) for v in rt.get('OCC_WINDOW_CAPS', [0, 0, 0])]
    smalls = [int(v) for v in rt.get('OCC_SMALL_CAPS', [0, 0, 0])]
    mids = [int(v) for v in rt.get('OCC_MID_CAPS', [0, 0, 0])]
    st = int(rt.get('OCC_SMALL_TOKENS', 16))
    mt = int(rt.get('OCC_MID_TOKENS', 48))
    out = []
    if smalls[i]:
        out.append((smalls[i], st))
    if mids[i]:
        out.append((mids[i], mt))
    if caps[i]:
        out.append((caps[i], 64))
    if not out:
        # no compaction: every window of the padded grid
        out.append((-1, 64))  # caller substitutes the window count
    return out


def model_flops_breakdown(cfg, batch=1):
    """Analytic forward FLOPs of the finetune detector (CenterPoint + SiamWCA)
    per batch, keyed by stage. Two frames run through VFE + SST (B=2*batch);
    WCA/fuse/BEV/head run on the current frame only (B=batch)."""
    H, W = _grid_hw(cfg)
    rt = cfg.get('RUNTIME', {})
    out = {}

    # --- VFE per-point MLP ---
    vfe = cfg.MODEL.VFE
    p = int(rt.get('MAX_POINTS', 131072))
    in_dim = 3  # f_center
    in_dim += 4 if vfe.get('USE_ABSLOTE_XYZ', True) else 1
    if vfe.get('USE_CLUSTER_XYZ', False):
        in_dim += 3
    if vfe.get('WITH_DISTANCE', False):
        in_dim += 1
    f = 0.0
    d = in_dim
    for k, widths in enumerate(vfe['MLPS']):
        for wdt in widths:
            f += 2.0 * p * d * wdt
            d = wdt
        d = 2 * d  # concat with maxed-back features between stacks
    out['vfe (2 frames)'] = f * 2 * batch

    # --- SST pyramid (both frames batched) + WCA (cur frame) ---
    blocks = cfg.MODEL.BACKBONE_3D['SST_BLOCK_LIST']
    c_prev = int(vfe['MLPS'][-1][-1])
    h, w = H, W
    for i, b in enumerate(blocks):
        e = b['ENCODER']
        c = int(e['D_MODEL'])
        ffn = int(e['DIM_FEEDFORWARD'])
        stride = int(e.get('STRIDE', 1))
        if stride > 1:
            h, w = (h + 1) // 2, (w + 1) // 2
        buckets = _stage_buckets(rt, i)
        if buckets[0][0] == -1:
            nwy = math.ceil((h + 8) / 8)  # padded window rows (either shift)
            nwx = math.ceil(w / 8)
            buckets = [(nwy * nwx, 64)]
        f = 0.0
        if stride > 1:
            f += _conv2d(h, w, c_prev, c, 3, 2 * batch)  # conv_down
        n_layers = 2 * int(e['NUM_BLOCKS'])
        f += n_layers * 2 * batch * encoder_layer_flops(c, ffn, buckets)
        f += _conv2d(h, w, c, c, 3, 2 * batch)  # conv_out
        out[f'sst_block_{i} (2 frames)'] = f
        fw = 2 * batch * encoder_layer_flops(c, ffn, buckets, cross=True)
        fw += _conv2d(h, w, c, c, 3, batch)  # wca conv_out
        out[f'wca_block_{i}'] = fw
        c_prev = c

    # --- pyramid fuse ---
    srcs = cfg.MODEL.BACKBONE_3D['FEATURES_SOURCE']
    fuse = cfg.MODEL.BACKBONE_3D['FUSE_LAYER']
    f = 0.0
    cs = []
    hh, ww = H, W
    strides = [int(b['ENCODER'].get('STRIDE', 1)) for b in blocks]
    c_in = [int(b['ENCODER']['D_MODEL']) for b in blocks]
    for i, s in enumerate(srcs):
        fl = fuse[s]
        up, cu = int(fl['UPSAMPLE_STRIDE']), int(fl['NUM_UPSAMPLE_FILTER'])
        # deconv k=s=up touches each output cell with exactly one tap
        f += 2.0 * batch * H * W * c_in[i] * cu
        cs.append(cu)
    cat = sum(cs)
    f += _conv2d(H, W, cat, cat // len(cs), 3, batch)  # conv_out fusion
    out['pyramid_fuse'] = f

    # --- BEV backbone ---
    bev = cfg.MODEL.BACKBONE_2D
    f = 0.0
    c = cat // len(cs)
    nf = int(bev.get('NUM_FILTER', c))
    if c != nf:
        f += _conv2d(H, W, c, nf, 1, batch)
    c = nf
    for kw in bev['CONV_KWARGS']:
        f += _conv2d(H, W, c, int(kw['out_channels']),
                     int(kw['kernel_size']), batch)
        c = int(kw['out_channels'])
    out['bev_backbone'] = f

    # --- CenterHead ---
    dh = cfg.MODEL.DENSE_HEAD
    sc = int(dh['SHARED_CONV_CHANNEL'])
    f = _conv2d(H, W, c, sc, 3, batch)
    for names in dh['CLASS_NAMES_EACH_HEAD']:
        heads = {k: dict(v) for k, v in dh['SEPARATE_HEAD_CFG']['HEAD_DICT'].items()}
        heads['hm'] = {'out_channels': len(names),
                       'num_conv': int(dh['NUM_HM_CONV'])}
        for hc in heads.values():
            for _ in range(int(hc['num_conv']) - 1):
                f += _conv2d(H, W, sc, sc, 3, batch)
            f += _conv2d(H, W, sc, int(hc['out_channels']), 3, batch)
    out['center_head'] = f
    return out


def mfu(flops, seconds, peak=V5E_PEAK_BF16):
    if seconds <= 0:
        return 0.0
    return flops / seconds / peak


def format_table(breakdown, times_ms=None, peak=V5E_PEAK_BF16):
    """Render ``stage | GFLOP | ms | TFLOP/s | MFU`` rows; ``times_ms`` maps
    stage name -> measured ms (missing stages show FLOPs only)."""
    rows = [f'{"stage":28s}{"GFLOP":>9s}{"ms":>8s}{"TFLOP/s":>9s}{"MFU":>7s}']
    tot_f, tot_ms = 0.0, 0.0
    for k, fl in breakdown.items():
        tot_f += fl
        ms = (times_ms or {}).get(k)
        if ms:
            tot_ms += ms
            tput = fl / (ms * 1e-3)
            rows.append(f'{k:28s}{fl / GIGA:9.1f}{ms:8.2f}'
                        f'{tput / 1e12:9.2f}{fl / (ms * 1e-3) / peak:7.1%}')
        else:
            rows.append(f'{k:28s}{fl / GIGA:9.1f}{"-":>8s}{"-":>9s}{"-":>7s}')
    if tot_ms:
        rows.append(f'{"TOTAL":28s}{tot_f / GIGA:9.1f}{tot_ms:8.2f}'
                    f'{tot_f / (tot_ms * 1e-3) / 1e12:9.2f}'
                    f'{tot_f / (tot_ms * 1e-3) / peak:7.1%}')
    else:
        rows.append(f'{"TOTAL":28s}{tot_f / GIGA:9.1f}')
    return '\n'.join(rows)
