"""Streaming serving (cached prev-frame pyramid): on consecutive frames the
prev-frame SST pyramid equals the previous step's cur-frame pyramid, so
CenterPoint(cached_prev=...) must reproduce the stateless two-frame forward
exactly. Measured +40% serving throughput on TPU (STATUS.md)."""

import numpy as np
import jax
import jax.numpy as jnp

from tiny_cfg import tiny_cfg, synth_batch


def test_streaming_cached_prev_matches_stateless():
    from tmae_tpu.models.detectors import build_detector

    cfg = tiny_cfg(mae=False)
    model = build_detector(cfg)
    rng = np.random.RandomState(3)
    batch = synth_batch(rng, B=1, P=256, n_real=200, n_gt=3)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), jb, train=False)

    # stateless two-frame forward
    out_ref = model.apply(variables, jb, train=False)

    # step 1: encode the prev frame as its own "cur" to harvest its pyramid
    b1 = dict(jb)
    b1['points'], b1['point_mask'] = jb['points_prev'], jb['point_mask_prev']
    out1 = model.apply(variables, b1, train=False, return_hidden=True)
    h_prev = out1['hidden_cur']

    # step 2: streaming forward with the cached pyramid
    out_s = model.apply(variables, jb, train=False, cached_prev=h_prev,
                        return_hidden=True)

    for gi, (a, b) in enumerate(zip(out_ref['pred_dicts'],
                                    out_s['pred_dicts'])):
        for k in a:
            np.testing.assert_allclose(
                np.asarray(a[k], np.float32), np.asarray(b[k], np.float32),
                atol=1e-5, rtol=1e-5,
                err_msg=f'streaming diverges at head {gi}/{k}')
