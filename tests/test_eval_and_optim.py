import numpy as np

from tmae_tpu.datasets.once_eval import get_evaluation_results
from tmae_tpu.train.optimization import one_cycle_schedules, build_optimizer

CLASSES = ['Car', 'Bus', 'Truck', 'Pedestrian', 'Cyclist']


def _anno(names, boxes, scores=None):
    d = {'name': np.asarray(names),
         'boxes_3d': np.asarray(boxes, np.float64).reshape(-1, 7)}
    if scores is not None:
        d['score'] = np.asarray(scores, np.float64)
    return d


def test_perfect_predictions_ap_100():
    gt, pred = [], []
    rng = np.random.RandomState(0)
    for _ in range(6):
        boxes = []
        names = []
        for i in range(5):
            boxes.append([rng.uniform(-20, 20), rng.uniform(-20, 20), 0.0,
                          4.0, 2.0, 1.6, rng.uniform(-np.pi, np.pi)])
            names.append(CLASSES[i % len(CLASSES)])
        gt.append(_anno(names, boxes))
        pred.append(_anno(names, boxes, scores=rng.uniform(0.5, 1.0, 5)))
    s, d = get_evaluation_results(gt, pred, CLASSES)
    assert abs(d['AP_Vehicle/overall'] - 100.0) < 1e-6
    assert abs(d['AP_mean/overall'] - 100.0) < 1e-6


def test_no_predictions_ap_0():
    gt = [_anno(['Car'], [[0, 0, 0, 4, 2, 1.6, 0]])]
    pred = [_anno([], np.zeros((0, 7)), scores=np.zeros(0))]
    s, d = get_evaluation_results(gt, pred, CLASSES)
    assert d['AP_Vehicle/overall'] == 0.0


def test_half_detected():
    # 2 GT cars, 1 detected → recall caps at 0.5, AP ≈ 50
    gt = [_anno(['Car', 'Car'],
                [[0, 0, 0, 4, 2, 1.6, 0], [20, 0, 0, 4, 2, 1.6, 0]])]
    pred = [_anno(['Car'], [[0, 0, 0, 4, 2, 1.6, 0]], scores=[0.9])]
    s, d = get_evaluation_results(gt, pred, CLASSES)
    assert 45.0 < d['AP_Vehicle/overall'] <= 52.0


def test_superclass_merge():
    # a Bus predicted where GT says Truck still matches 'Vehicle'
    gt = [_anno(['Truck'], [[0, 0, 0, 6, 2.5, 3, 0]])]
    pred = [_anno(['Bus'], [[0, 0, 0, 6, 2.5, 3, 0]], scores=[0.9])]
    s, d = get_evaluation_results(gt, pred, CLASSES)
    assert d['AP_Vehicle/overall'] == 100.0


def test_one_cycle_schedule_endpoints():
    lr_fn, mom_fn = one_cycle_schedules(
        100, lr_max=3e-3, moms=(0.95, 0.85), div_factor=10, pct_start=0.4
    )
    assert np.isclose(float(lr_fn(0)), 3e-4, rtol=1e-5)
    assert np.isclose(float(lr_fn(40)), 3e-3, rtol=1e-3)
    assert float(lr_fn(100)) < 3e-6
    assert np.isclose(float(mom_fn(0)), 0.95, rtol=1e-5)
    assert np.isclose(float(mom_fn(40)), 0.85, rtol=1e-2)
    assert np.isclose(float(mom_fn(100)), 0.95, rtol=1e-4)


def test_build_optimizer_runs():
    import jax
    import jax.numpy as jnp
    import optax
    cfg = {
        'OPTIMIZER': 'adam_onecycle', 'LR': 0.003, 'WEIGHT_DECAY': 0.01,
        'NUM_EPOCHS': 2, 'MOMS': [0.95, 0.85], 'PCT_START': 0.4,
        'DIV_FACTOR': 10, 'GRAD_NORM_CLIP': 10,
    }
    tx, lr_fn = build_optimizer(cfg, steps_per_epoch=5)
    params = {'w': jnp.ones((3,)), 'b': jnp.zeros((2,))}
    state = tx.init(params)
    grads = {'w': jnp.ones((3,)), 'b': jnp.ones((2,))}
    updates, state = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert np.all(np.isfinite(np.asarray(new['w'])))
    assert float(new['w'][0]) < 1.0  # moved against gradient
