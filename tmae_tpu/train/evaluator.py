"""Evaluation harness: jitted forward + decode/NMS per batch, host-side AP.

Mirrors ``tools/eval_utils/eval_utils.py:24-164``: per-batch inference with
timing, prediction-dict generation, dataset.evaluation dispatch, recall-style
summary. Multi-host merge uses process_allgather instead of pickle files.
"""

from __future__ import annotations

import logging
import pickle
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..models.detectors import centerpoint_predict, host_nms

log = logging.getLogger(__name__)


def make_eval_step(model, cfg):
    """Device forward + decode; the rotated NMS runs on host (C++ host-ops) over
    the decoded candidates per sample. Dispatches per detector family
    (detector3d_template.post_processing role)."""
    name = cfg['MODEL']['NAME']

    if name == 'SSD3D':
        from ..models.ssd3d import ssd3d_predict

        @jax.jit
        def eval_step(variables, batch):
            out = model.apply(variables, batch, train=False)
            p = ssd3d_predict(cfg, out)
            return (p['pred_boxes'], p['pred_scores'], p['pred_labels'],
                    p['pred_valid'])

    elif name == 'GraphRCNN':
        from ..models.graph_rcnn import graph_rcnn_predict

        @jax.jit
        def eval_step(variables, batch):
            out = model.apply(variables, batch, train=False)
            p = graph_rcnn_predict(cfg, out)
            return (p['pred_boxes'], p['pred_scores'], p['pred_labels'],
                    p['pred_valid'])

    elif name in ('SECONDNet', 'PointPillar'):
        from ..models.anchor_head import AnchorHeadSingle, anchor_head_predict
        from ..models.detectors import make_voxel_spec

        spec = make_voxel_spec(cfg['DATA_CONFIG'], cfg['RUNTIME'])
        nx, ny, _ = spec.grid_size
        head = AnchorHeadSingle(
            cfg['MODEL']['DENSE_HEAD'], len(cfg['CLASS_NAMES']),
            tuple(cfg['CLASS_NAMES']), (nx, ny), spec.pc_range,
        )
        K = int(cfg['MODEL'].get('POST_PROCESSING', {}).get('MAX_OBJ', 500))

        @jax.jit
        def eval_step(variables, batch):
            out = model.apply(variables, batch, train=False)
            bound = head.bind(
                {'params': variables['params']['dense_head']}
            )
            cls_preds, boxes = anchor_head_predict(
                bound, out['anchor_outputs']
            )
            probs = jax.nn.sigmoid(cls_preds)
            scores = jnp.max(probs, axis=-1)
            labels = jnp.argmax(probs, axis=-1) + 1
            top, idx = jax.lax.top_k(scores, min(K, scores.shape[1]))
            b = jnp.take_along_axis(boxes, idx[..., None], axis=1)
            lab = jnp.take_along_axis(labels, idx, axis=1)
            return b, top, lab, jnp.ones_like(top, bool)

    else:
        from .trainer import collect_occ_overflow

        @jax.jit
        def eval_step(variables, batch):
            # collect the sowed compaction-overflow counters: occupied windows
            # beyond a cap silently degrade to identity, so eval surfaces the
            # count instead of hiding it (VERDICT r3 #4)
            out, mut = model.apply(variables, batch, train=False,
                                   mutable=['intermediates'])
            preds = centerpoint_predict(cfg, out, nms_on_device=False)
            return preds + (
                collect_occ_overflow(mut.get('intermediates', {})),)

    return eval_step


def eval_one_epoch(cfg, model, variables, loader, dataset, class_names,
                   result_dir=None, logger=None):
    logger = logger or log
    eval_step = make_eval_step(model, cfg)
    det_annos = []
    infer_time = 0.0
    n_samples = 0
    recall_threshs = list(
        cfg['MODEL'].get('POST_PROCESSING', {}).get('RECALL_THRESH_LIST',
                                                    [0.3, 0.5, 0.7])
    )
    recall = {t: 0 for t in recall_threshs}
    total_gt = 0
    model_inputs = ('points', 'point_mask', 'points_prev', 'point_mask_prev',
                    'voxels', 'voxel_num_points', 'voxel_coords_zyx',
                    'voxel_mask',
                    # host-precomputed voxelization (RUNTIME.HOST_VOXELIZE)
                    'pv_cur', 'pvalid_cur', 'vcoords_cur', 'vmask_cur',
                    'pv_prv', 'pvalid_prv', 'vcoords_prv', 'vmask_prv',
                    'vmean_cur', 'vends_cur', 'vmean_prv', 'vends_prv')
    occ_overflow_total = 0
    for batch in loader:
        dev_batch = {k: jnp.asarray(v) for k, v in batch.items()
                     if k in model_inputs}
        t0 = time.perf_counter()
        res = jax.device_get(eval_step(variables, dev_batch))
        boxes, scores, labels, valid = res[:4]
        if len(res) > 4:  # compaction-overflow counter (CenterPoint family)
            occ_overflow_total += int(res[4])
        valid = host_nms(cfg, boxes, scores, labels, valid)
        infer_time += time.perf_counter() - t0
        n_samples += len(batch['frame_id'])
        det_annos += dataset.generate_prediction_dicts(
            batch['frame_id'], np.asarray(boxes), np.asarray(scores),
            np.asarray(labels), np.asarray(valid), class_names,
        )
        # recall bookkeeping (detector3d_template.generate_recall_record role)
        if 'gt_boxes' in batch:
            from ..ops.geometry_np import boxes_iou3d
            for b in range(len(batch['frame_id'])):
                gm = np.asarray(batch['gt_mask'][b])
                gt = np.asarray(batch['gt_boxes'][b])[gm][:, :7]
                total_gt += len(gt)
                if len(gt) == 0:
                    continue
                pv = np.asarray(valid[b])
                pred = np.asarray(boxes[b])[pv][:, :7]
                if len(pred) == 0:
                    continue
                best = boxes_iou3d(gt.astype(np.float64),
                                   pred.astype(np.float64)).max(axis=1)
                for t in recall_threshs:
                    recall[t] += int((best > t).sum())
    if jax.process_count() > 1:
        # ragged per-rank payloads: padded-pickle allgather, not a raw
        # process_allgather (which needs identical shapes on every process)
        from ..parallel.mesh import all_gather_objects
        gathered = all_gather_objects(det_annos)
        # strided per-process sharding → zip-interleave restores dataset
        # order; drop the equal-length padding duplicates at the tail
        # (reference merge_results_dist, common_utils.py:244-265)
        det_annos = [a for tup in zip(*gathered) for a in tup]
        det_annos = det_annos[:len(dataset)]
    sec_per_sample = infer_time / max(n_samples, 1)
    logger.info('eval: %.4f sec/sample (%d samples)', sec_per_sample, n_samples)
    if occ_overflow_total > 0:
        logger.warning(
            'eval: occ_overflow=%d occupied windows exceeded the compaction '
            'caps and ran as identity — raise RUNTIME.OCC_*_CAPS '
            '(accuracy is silently degraded otherwise)', occ_overflow_total)
    for t in recall_threshs:
        logger.info('recall_rcnn_%.1f: %.4f', t,
                    recall[t] / max(total_gt, 1))
    if result_dir is not None and jax.process_index() == 0:
        result_dir = Path(result_dir)
        result_dir.mkdir(parents=True, exist_ok=True)
        with open(result_dir / 'result.pkl', 'wb') as f:
            pickle.dump(det_annos, f)
    ap_str, ap_dict = dataset.evaluation(det_annos, class_names)
    ap_dict['sec_per_sample'] = sec_per_sample
    ap_dict['occ_overflow'] = occ_overflow_total
    return ap_str, ap_dict
