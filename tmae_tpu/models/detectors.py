"""Detector shells + module registries.

Mirrors the reference's ``Detector3DTemplate.build_networks`` module topology
(``detector3d_template.py:25-59``): VFE → BACKBONE_3D → BACKBONE_2D → DENSE_HEAD,
each stage resolved by config NAME from a registry. Exposed detectors:

  * ``CenterPoint`` — detection shell (``detectors/centerpoint.py``); works with the
    temporal SiamWCA backbone (t_mae.yaml) or the single-frame SPTBackbone.
  * ``TMAE`` — masked-autoencoder pretrain shell (``detectors/t_mae.py``) for
    SiamWCA_MAE; ``GDMAE`` — single-frame variant (``detectors/gd_mae.py``) for
    SPTBackboneMAE.

The interface is functional: ``model.apply(variables, batch, train)`` returns
outputs; losses are pure functions of outputs (natural fit for jitted training).

Static batch layout (DESIGN.md §1):
  points [B, P, 4] (x, y, z, intensity), point_mask [B, P]
  points_prev / point_mask_prev        (temporal models)
  gt_boxes [B, M, 8] (x,y,z,dx,dy,dz,heading,label 1-indexed), gt_mask [B, M]
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.centernet import assign_center_targets
from ..ops.voxelize import VoxelSpec
from .bev import BaseBEVBackbone, SSTBEVBackbone
from .center_head import CenterHead, center_head_loss, decode_and_nms
from .siamwca import SiamWCA, SiamWCA_MAE
from .spt_backbone import SPTBackbone, SPTBackboneMAE
from .sst import VoxelSet
from .vfe import TemporalDynVFE, DynVFE

TEMPORAL_VFES = {'TemporalDynVFE'}
TEMPORAL_BACKBONES = {'SiamWCA', 'SiamWCA_MAE'}
MAE_BACKBONES = {'SiamWCA_MAE', 'SPTBackboneMAE'}


def make_voxel_spec(data_cfg, runtime_cfg) -> VoxelSpec:
    proc = [p for p in data_cfg['DATA_PROCESSOR']
            if p['NAME'] in ('calculate_grid_size', 'transform_points_to_voxels')]
    voxel_size = tuple(proc[-1]['VOXEL_SIZE']) if proc else (0.32, 0.32, 8.0)
    return VoxelSpec(
        pc_range=tuple(data_cfg['POINT_CLOUD_RANGE']),
        voxel_size=voxel_size,
        max_points=int(runtime_cfg['MAX_POINTS']),
        max_voxels=int(runtime_cfg['MAX_VOXELS'][0]),
    )


def _grid_hw(spec: VoxelSpec):
    nx, ny, _ = spec.grid_size
    return (ny, nx)


class _DetectorBase(nn.Module):
    """Shared stage builders."""

    model_cfg: Any
    class_names: Sequence[str]
    spec: VoxelSpec
    max_voxels_per_level: Sequence[int]
    # occupied-window compaction caps per pyramid level (RUNTIME.OCC_WINDOW_CAPS;
    # empty = dense windows). See ops/occ_compact.py. OCC_SMALL_CAPS adds the
    # token-bucketed small-window plan (cap per level, S = OCC_SMALL_TOKENS).
    occ_window_caps: Sequence[int] = ()
    occ_small_caps: Sequence[int] = ()
    occ_small_tokens: int = 16
    occ_mid_caps: Sequence[int] = ()
    occ_mid_tokens: int = 48
    vfe_compute: str = 'f32'  # RUNTIME.VFE_COMPUTE: 'bf16' halves VFE traffic
    vfe_remat: bool = True    # RUNTIME.VFE_REMAT: rematerialize the VFE MLP
    # RUNTIME.REMAT_STAGES: per-pyramid-stage rematerialization of the SST
    # shift blocks (empty = remat everywhere). Stages 1-2 carry 4x/16x
    # smaller activations than stride 1 — skipping their remat trades HBM
    # for not recomputing those blocks in the backward.
    remat_stages: Sequence[bool] = ()

    def _vfe(self, batch, train, skip_prev: bool = False):
        """Run the configured VFE; returns (vs_cur, vs_prv|None, cur_extras).
        ``skip_prev``: streaming serving — the prev pyramid is cached, so the
        prev-frame VFE is skipped (vs_prv aliases vs_cur, unused)."""
        vfe_cfg = self.model_cfg['VFE']
        name = vfe_cfg['NAME']
        hw = _grid_hw(self.spec)
        kwargs = dict(
            mlps=[list(m) for m in vfe_cfg['MLPS']],
            use_absolute_xyz=vfe_cfg.get('USE_ABSLOTE_XYZ', True),
            use_cluster_xyz=vfe_cfg.get('USE_CLUSTER_XYZ', True),
            with_distance=vfe_cfg.get('WITH_DISTANCE', False),
            compute_dtype=str(self.vfe_compute),
        )
        if name == 'TemporalDynVFE':
            kwargs['remat'] = bool(self.vfe_remat)
            # host-precomputed voxelization (RUNTIME.HOST_VOXELIZE): the
            # input pipeline ships the point→pillar map, skipping the
            # ~2.1 ms/frame device voxelize
            def hv(which):
                if f'pv_{which}' not in batch:
                    return None
                d = {
                    'point_voxel': batch[f'pv_{which}'],
                    'point_valid': batch[f'pvalid_{which}'],
                    'voxel_coords': batch[f'vcoords_{which}'],
                    'voxel_mask': batch[f'vmask_{which}'],
                }
                # sorted host voxelization extras (HOST_VOXELIZE_SORT): the
                # precomputed pillar mean + segment ends let the VFE skip
                # its scatter passes (ops/voxelize.py voxelize_host)
                if f'vmean_{which}' in batch:
                    d['voxel_mean_xyz'] = batch[f'vmean_{which}']
                    d['seg_ends'] = batch[f'vends_{which}']
                return d

            cur, prv = TemporalDynVFE(self.spec, name='vfe', **kwargs)(
                batch['points'], batch['point_mask'],
                batch['points_prev'], batch['point_mask_prev'], train,
                prev_needed=not skip_prev,
                hostvox_cur=hv('cur'), hostvox_prv=hv('prv'),
            )
            # prv is None on the streaming skip path (cached prev pyramid)
            vs_prv = (VoxelSet(prv['voxel_features'], prv['voxel_coords'],
                               prv['voxel_mask'], hw)
                      if prv is not None else None)
        elif name == 'DynVFE':
            cur = DynVFE(self.spec, name='vfe', **kwargs)(
                batch['points'], batch['point_mask'], train
            )
            vs_prv = None
        else:
            raise NotImplementedError(
                f'VFE {name} requires host-voxelized inputs; use the dynamic VFEs'
                ' for on-device voxelization'
            )
        vs_cur = VoxelSet(cur['voxel_features'], cur['voxel_coords'],
                          cur['voxel_mask'], hw)
        return vs_cur, vs_prv, cur

    def _backbone_2d(self, spatial, train):
        cfg2d = self.model_cfg.get('BACKBONE_2D')
        if cfg2d is None:
            return spatial
        name = cfg2d['NAME']
        cls = {'SSTBEVBackbone': SSTBEVBackbone,
               'BaseBEVBackbone': BaseBEVBackbone}[name]
        return cls(cfg2d, name='backbone_2d')(spatial, train)


class CenterPoint(_DetectorBase):
    """Finetune/detection shell: VFE → (SiamWCA | SPTBackbone) → BACKBONE_2D →
    CenterHead."""

    @nn.compact
    def __call__(self, batch, train: bool, cached_prev=None,
                 return_hidden: bool = False):
        """Streaming serving (SiamWCA only): thread the previous step's
        ``hidden_cur`` back in as ``cached_prev`` to skip the prev-frame
        pyramid (it equals the previous step's cur pyramid on consecutive
        frames)."""
        vs_cur, vs_prv, _ = self._vfe(batch, train,
                                      skip_prev=cached_prev is not None)
        b3d = self.model_cfg['BACKBONE_3D']
        hidden_cur = None
        if b3d['NAME'] == 'SiamWCA':
            out3d = SiamWCA(
                b3d, self.max_voxels_per_level,
                occ_window_caps=self.occ_window_caps,
                occ_small_caps=self.occ_small_caps,
                occ_small_tokens=self.occ_small_tokens,
                occ_mid_caps=self.occ_mid_caps,
                remat_stages=self.remat_stages,
                occ_mid_tokens=self.occ_mid_tokens, name='backbone_3d'
            )(vs_cur, vs_prv, train, cached_prev=cached_prev,
              return_hidden=return_hidden)
            if return_hidden:
                spatial, _, hidden_cur = out3d
            else:
                spatial, _ = out3d
        elif b3d['NAME'] == 'SPTBackbone':
            spatial, _ = SPTBackbone(
                b3d, self.max_voxels_per_level,
                occ_window_caps=self.occ_window_caps,
                occ_small_caps=self.occ_small_caps,
                occ_small_tokens=self.occ_small_tokens,
                occ_mid_caps=self.occ_mid_caps,
                remat_stages=self.remat_stages,
                occ_mid_tokens=self.occ_mid_tokens, name='backbone_3d'
            )(vs_cur, train)
        else:
            raise NotImplementedError(b3d['NAME'])
        spatial2d = self._backbone_2d(spatial, train)
        pred_dicts = CenterHead(
            self.model_cfg['DENSE_HEAD'], len(self.class_names),
            self.class_names, self.spec.voxel_size, self.spec.pc_range,
            name='dense_head',
        )(spatial2d, train)
        out = {'pred_dicts': pred_dicts, 'spatial_features_2d': spatial2d}
        if return_hidden:
            out['hidden_cur'] = hidden_cur
        return out


class TMAE(_DetectorBase):
    """Pretrain shell for the temporal MAE backbone (loss from backbone)."""

    @nn.compact
    def __call__(self, batch, train: bool, mask_rng=None):
        vs_cur, vs_prv, cur = self._vfe(batch, train)
        b3d = self.model_cfg['BACKBONE_3D']
        if b3d['NAME'] == 'SiamWCA_MAE':
            out = SiamWCA_MAE(
                b3d, self.max_voxels_per_level,
                voxel_size=self.spec.voxel_size, pc_range=self.spec.pc_range,
                occ_window_caps=self.occ_window_caps,
                occ_small_caps=self.occ_small_caps,
                occ_small_tokens=self.occ_small_tokens,
                occ_mid_caps=self.occ_mid_caps,
                remat_stages=self.remat_stages,
                occ_mid_tokens=self.occ_mid_tokens, name='backbone_3d',
            )(vs_cur, vs_prv, batch['points'][..., :3], cur['point_voxel'],
              cur['point_valid'], train, mask_rng=mask_rng)
        elif b3d['NAME'] == 'SPTBackboneMAE':
            out = SPTBackboneMAE(
                b3d, self.max_voxels_per_level,
                voxel_size=self.spec.voxel_size, pc_range=self.spec.pc_range,
                occ_window_caps=self.occ_window_caps,
                occ_small_caps=self.occ_small_caps,
                occ_small_tokens=self.occ_small_tokens,
                occ_mid_caps=self.occ_mid_caps,
                remat_stages=self.remat_stages,
                occ_mid_tokens=self.occ_mid_tokens, name='backbone_3d',
            )(vs_cur, batch['points'][..., :3], cur['point_voxel'],
              cur['point_valid'], train, mask_rng=mask_rng)
        else:
            raise NotImplementedError(b3d['NAME'])
        return out


class GDMAE(TMAE):
    """Single-frame MAE shell (reference ``detectors/gd_mae.py``); identical
    functional surface to TMAE with a single-frame VFE/backbone config."""


from .pointpillar import PointPillar  # noqa: E402
from .second_net import SECONDNet  # noqa: E402
from .ssd3d import SSD3D  # noqa: E402
from .graph_rcnn import GraphRCNN  # noqa: E402

_DETECTORS = {
    'CenterPoint': CenterPoint,
    'TMAE': TMAE,
    'GDMAE': GDMAE,
    'PointPillar': PointPillar,
    'SECONDNet': SECONDNet,
    'SSD3D': SSD3D,
    'GraphRCNN': GraphRCNN,
}


def register_detector(name, cls):
    _DETECTORS[name] = cls


def build_detector(cfg):
    """cfg: full config (CLASS_NAMES, DATA_CONFIG, MODEL, RUNTIME). Returns the
    flax module."""
    model_cfg = cfg['MODEL']
    runtime = cfg['RUNTIME']
    spec = make_voxel_spec(cfg['DATA_CONFIG'], runtime)
    name = model_cfg['NAME']
    if name not in _DETECTORS:
        raise KeyError(f'unknown detector {name}; have {list(_DETECTORS)}')
    cls = _DETECTORS[name]
    return cls(
        model_cfg=model_cfg,
        class_names=tuple(cfg['CLASS_NAMES']),
        spec=spec,
        max_voxels_per_level=tuple(int(v) for v in runtime['MAX_VOXELS']),
        occ_window_caps=tuple(
            int(v) for v in runtime.get('OCC_WINDOW_CAPS', ())),
        occ_small_caps=tuple(
            int(v) for v in runtime.get('OCC_SMALL_CAPS', ())),
        occ_small_tokens=int(runtime.get('OCC_SMALL_TOKENS', 16)),
        occ_mid_caps=tuple(
            int(v) for v in runtime.get('OCC_MID_CAPS', ())),
        occ_mid_tokens=int(runtime.get('OCC_MID_TOKENS', 48)),
        vfe_compute=str(runtime.get('VFE_COMPUTE', 'f32')),
        vfe_remat=bool(runtime.get('VFE_REMAT', True)),
        remat_stages=tuple(
            bool(v) for v in runtime.get('REMAT_STAGES', ())),
    )


def centerpoint_loss(cfg, outputs, batch):
    """Training loss for CenterPoint (CenterHead targets + focal/L1)."""
    head_cfg = cfg['MODEL']['DENSE_HEAD']
    spec = make_voxel_spec(cfg['DATA_CONFIG'], cfg['RUNTIME'])
    hw = _grid_hw(spec)
    stride = int(head_cfg['TARGET_ASSIGNER_CONFIG'].get('FEATURE_MAP_STRIDE', 1))
    fm = (hw[1] // stride, hw[0] // stride)  # (x, y) like the reference
    class_names = list(cfg['CLASS_NAMES'])
    groups = head_cfg['CLASS_NAMES_EACH_HEAD']
    target_dicts = []
    for names in groups:
        # remap labels into this group's local 1..len(names)
        gmap = np.zeros(len(class_names) + 1, np.int32)
        for li, n in enumerate(names):
            gmap[class_names.index(n) + 1] = li + 1
        gmap_j = jnp.asarray(gmap)
        labels = batch['gt_boxes'][..., 7].astype(jnp.int32)
        local = gmap_j[jnp.clip(labels, 0, len(class_names))]
        in_group = (local > 0) & batch['gt_mask']
        gt = batch['gt_boxes'].at[..., 7].set(local.astype(jnp.float32))
        td = assign_center_targets(
            gt, in_group, num_classes=len(names), feature_map_size=fm,
            point_cloud_range=spec.pc_range, voxel_size=spec.voxel_size,
            feature_map_stride=stride,
            gaussian_overlap=float(
                head_cfg['TARGET_ASSIGNER_CONFIG']['GAUSSIAN_OVERLAP']),
            min_radius=int(head_cfg['TARGET_ASSIGNER_CONFIG']['MIN_RADIUS']),
        )
        target_dicts.append(td)
    lw = head_cfg['LOSS_CONFIG']['LOSS_WEIGHTS']
    head_order = list(head_cfg['SEPARATE_HEAD_CFG']['HEAD_ORDER'])
    # optional IoU head (reference center_head.py:97,260-277): active when a
    # config declares 'iou' in SEPARATE_HEAD_CFG.HEAD_DICT
    iou_cfg = None
    if 'iou' in head_cfg['SEPARATE_HEAD_CFG']['HEAD_DICT']:
        iou_cfg = {'voxel_size': spec.voxel_size, 'pc_range': spec.pc_range,
                   'feature_map_stride': stride}
    return center_head_loss(outputs['pred_dicts'], target_dicts, head_order,
                            lw, iou_cfg=iou_cfg)


def tmae_loss(cfg, outputs, batch):
    loss = SiamWCA_MAE.loss(outputs)
    return loss, {'loss_rpn': loss}


def centerpoint_predict(cfg, outputs, nms_on_device: bool = True,
                        exact_topk: bool = True):
    """Decode + NMS → (boxes [B,K,7], scores, labels 1-indexed, valid).

    ``exact_topk=True`` (default, the eval path) matches the reference
    ``_topk`` exactly; the serving/bench hot path opts into
    ``jax.lax.approx_max_k`` (recall 0.99) with ``exact_topk=False``.

    ``nms_on_device=False`` decodes on device and leaves the rotated NMS to
    ``host_nms`` (the C++ host-ops path) — K=500 candidate boxes are a trivial
    transfer, and host NMS avoids burning device time on an irregular kernel."""
    head_cfg = cfg['MODEL']['DENSE_HEAD']
    spec = make_voxel_spec(cfg['DATA_CONFIG'], cfg['RUNTIME'])
    stride = int(head_cfg['TARGET_ASSIGNER_CONFIG'].get('FEATURE_MAP_STRIDE', 1))
    groups = head_cfg['CLASS_NAMES_EACH_HEAD']
    class_names = list(cfg['CLASS_NAMES'])
    id_maps = [
        np.asarray([class_names.index(n) for n in g], np.int32) for g in groups
    ]
    return decode_and_nms(
        outputs['pred_dicts'], dict(head_cfg['POST_PROCESSING']),
        spec.voxel_size, spec.pc_range, stride, id_maps,
        nms_on_device=nms_on_device, exact_topk=exact_topk,
    )


def host_nms(cfg, boxes, scores, labels, valid):
    """Greedy rotated-BEV NMS on host arrays (native C++ with numpy fallback),
    applied per sample to score-sorted candidates from ``centerpoint_predict(...,
    nms_on_device=False)``. Returns the updated valid mask."""
    from ..ops.geometry_np import nms_bev
    from ..utils import native
    nms_cfg = cfg['MODEL']['DENSE_HEAD']['POST_PROCESSING']['NMS_CONFIG']
    boxes = np.asarray(boxes)
    valid = np.asarray(valid).copy()
    if str(nms_cfg.get('NMS_TYPE', 'nms_gpu')) == 'multi_class_nms':
        # per-class thresholds on already-rectified scores; candidates come
        # score-sorted from decode (model_nms_utils.py:33-46)
        threshs = list(nms_cfg['NMS_THRESH'])
        posts = nms_cfg['NMS_POST_MAXSIZE']
        posts = (list(posts) if isinstance(posts, (list, tuple))
                 else [int(posts)] * len(threshs))
        labels = np.asarray(labels)
        scores_np = np.asarray(scores)
        for b in range(boxes.shape[0]):
            for c, (th, po) in enumerate(zip(threshs, posts)):
                sel = np.nonzero(valid[b] & (labels[b] == c + 1))[0]
                if sel.size == 0:
                    continue
                kept_idx = nms_bev(boxes[b, sel, :7].astype(np.float64),
                                   scores_np[b, sel], float(th),
                                   post_maxsize=int(po))
                keep = np.zeros(sel.size, bool)
                keep[kept_idx] = True
                valid[b, sel] &= keep
        return valid
    thresh = float(nms_cfg['NMS_THRESH'])
    post = int(nms_cfg['NMS_POST_MAXSIZE'])
    for b in range(boxes.shape[0]):
        n = int(valid[b].sum())
        if n == 0:
            continue
        # candidates are sorted by score desc with valid first
        cand = boxes[b, :n, :7].astype(np.float64)
        keep = native.nms_bev_sorted(cand, thresh, post)
        if keep is None:
            kept_idx = nms_bev(cand, np.asarray(scores[b, :n]), thresh,
                               post_maxsize=post)
            keep = np.zeros(n, bool)
            keep[kept_idx] = True
        valid[b, :n] &= keep
    return valid
