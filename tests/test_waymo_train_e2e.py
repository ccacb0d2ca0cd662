"""Waymo-config training e2e (VERDICT r4 #8): one jitted train step + eval
dispatch on the REAL ``tools/cfgs/waymo_models/t_mae{_ssl,}_waymo.yaml`` model
sections, fed from a self-built TFRecord fixture through the native decode
chain (tests/test_waymo_decode.py) — mirrors ``tests/test_e2e.py`` for the
Waymo family (reference recipe:
``pcdet/datasets/waymo_temporal/waymo_temporal_dataset.py:29-147``)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / 'tools'))

from tests.test_waymo_decode import _synth_frame_bytes  # noqa: E402
from tmae_tpu.config import cfg_from_yaml_file  # noqa: E402
from tmae_tpu.datasets import waymo_decode as wd  # noqa: E402
from tmae_tpu.datasets.dataset import build_dataloader  # noqa: E402
from tmae_tpu.models.detectors import (  # noqa: E402
    build_detector, centerpoint_loss, centerpoint_predict, tmae_loss,
)
from tmae_tpu.train.optimization import build_optimizer  # noqa: E402
from tmae_tpu.train.trainer import (  # noqa: E402
    create_train_state, jit_train_step, make_data_mesh, make_train_step,
    replicate_state, shard_batch,
)


@pytest.fixture(scope='module')
def waymo_root(tmp_path_factory):
    """TFRecord → native decode → sequence artifacts, once per module."""
    import create_waymo_infos as cwi

    root = tmp_path_factory.mktemp('waymo_root')
    raw = root / 'raw'
    raw.mkdir()
    rng = np.random.RandomState(0)
    wd.write_tfrecord(raw / 'seq_e2e.tfrecord',
                      [_synth_frame_bytes(i, rng) for i in range(4)])
    frames = cwi.decode_tfrecord_sequence(raw / 'seq_e2e.tfrecord')
    data = root / 'waymo_processed_data'
    (root / 'ImageSets').mkdir()
    (root / 'ImageSets' / 'train.txt').write_text('seq_e2e\n')
    (root / 'ImageSets' / 'val.txt').write_text('seq_e2e\n')
    cwi.build_sequence_artifacts(frames, 'seq_e2e', data)
    return root


def _tiny_waymo_cfg(name):
    """The real Waymo model config shrunk to a CPU-compilable grid: the MODEL
    section (heads, SiamWCA pyramid, losses) is untouched; only the scene
    range, caps and augmentor change."""
    cfg = cfg_from_yaml_file(REPO / f'tools/cfgs/waymo_models/{name}.yaml')
    cfg.DATA_CONFIG.POINT_CLOUD_RANGE = [-10.24, -10.24, -2.0, 10.24, 10.24, 4.0]
    cfg.DATA_CONFIG.DATA_AUGMENTOR.AUG_CONFIG_LIST = [
        a for a in cfg.DATA_CONFIG.DATA_AUGMENTOR.AUG_CONFIG_LIST
        if a['NAME'] != 'gt_sampling'
    ]
    cfg.RUNTIME.MAX_POINTS = 2048
    cfg.RUNTIME.MAX_VOXELS = [512, 256, 128]
    cfg.RUNTIME.MAX_GT = 8
    cfg.RUNTIME.OCC_WINDOW_CAPS = [32, 16, 16]
    cfg.RUNTIME.OCC_SMALL_CAPS = [0, 0, 0]
    cfg.RUNTIME.OCC_MID_CAPS = [0, 0, 0]
    cfg.RUNTIME.HOST_VOXELIZE = False
    return cfg


@pytest.mark.slow
@pytest.mark.parametrize('name,mae', [('t_mae_waymo', False),
                                      ('t_mae_ssl_waymo', True)])
def test_waymo_config_trains_one_step(waymo_root, name, mae):
    cfg = _tiny_waymo_cfg(name)
    ds, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=True,
        runtime_cfg=cfg.RUNTIME, root_path=str(waymo_root), seed=0,
    )
    assert len(ds) >= 2
    batch = next(iter(loader))
    assert batch['point_mask'].sum() > 0
    jbatch = {k: jnp.asarray(v) for k, v in batch.items() if k != 'frame_id'}

    model = build_detector(cfg)
    rngs = {'params': jax.random.PRNGKey(0)}
    if mae:
        rngs['mae_mask'] = jax.random.PRNGKey(1)
    variables = model.init(rngs, jbatch, train=False)
    tx, _ = build_optimizer(dict(cfg.OPTIMIZATION), steps_per_epoch=10)
    state = create_train_state(variables, tx)
    loss_fn = (
        (lambda out, b: tmae_loss(cfg, out, b)) if mae
        else (lambda out, b: centerpoint_loss(cfg, out, b))
    )
    if not mae:
        # eval dispatch first: decode + NMS on the finetune head (the train
        # step below DONATES the variables' buffers)
        out = model.apply(variables, jbatch, train=False)
        boxes, scores, labels, valid = jax.device_get(
            centerpoint_predict(cfg, out, nms_on_device=False))
        assert boxes.shape[-1] == 7
        assert np.isfinite(boxes[np.asarray(valid)]).all()

    mesh = make_data_mesh(jax.devices()[:2])
    step = jit_train_step(
        make_train_step(model, loss_fn, tx,
                        rng_names=('mae_mask',) if mae else ()), mesh,
    )
    state = replicate_state(state, mesh)
    dev_batch = shard_batch(jbatch, mesh)
    state, metrics = step(state, dev_batch, jax.random.PRNGKey(100))
    assert np.isfinite(float(metrics['loss'])), metrics
