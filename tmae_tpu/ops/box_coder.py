"""Box coders (reference ``pcdet/utils/box_coder_utils.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


class ResidualCoder:
    """Anchor-residual encoding (box_coder_utils.py:5-79)."""

    def __init__(self, code_size=7, encode_angle_by_sincos=False):
        self.code_size = code_size + (1 if encode_angle_by_sincos else 0)
        self.encode_angle_by_sincos = encode_angle_by_sincos

    def encode(self, boxes, anchors):
        """boxes [..., 7+], anchors [..., 7+] → [..., code_size]."""
        xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors[..., :7], 7, axis=-1)
        xg, yg, zg, dxg, dyg, dzg, rg = jnp.split(boxes[..., :7], 7, axis=-1)
        dxa = jnp.clip(dxa, 1e-5)
        dya = jnp.clip(dya, 1e-5)
        dza = jnp.clip(dza, 1e-5)
        dxg = jnp.clip(dxg, 1e-5)
        dyg = jnp.clip(dyg, 1e-5)
        dzg = jnp.clip(dzg, 1e-5)
        diag = jnp.sqrt(dxa ** 2 + dya ** 2)
        xt = (xg - xa) / diag
        yt = (yg - ya) / diag
        zt = (zg - za) / dza
        dxt = jnp.log(dxg / dxa)
        dyt = jnp.log(dyg / dya)
        dzt = jnp.log(dzg / dza)
        if self.encode_angle_by_sincos:
            rt = [jnp.cos(rg) - jnp.cos(ra), jnp.sin(rg) - jnp.sin(ra)]
        else:
            rt = [rg - ra]
        extras = []
        if boxes.shape[-1] > 7:
            extras = [boxes[..., 7:] - anchors[..., 7:]]
        return jnp.concatenate([xt, yt, zt, dxt, dyt, dzt, *rt, *extras], axis=-1)

    def decode(self, encodings, anchors):
        xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors[..., :7], 7, axis=-1)
        if self.encode_angle_by_sincos:
            xt, yt, zt, dxt, dyt, dzt = jnp.split(
                encodings[..., :6], 6, axis=-1
            )
            cost = encodings[..., 6:7]
            sint = encodings[..., 7:8]
            extras = encodings[..., 8:]
        else:
            xt, yt, zt, dxt, dyt, dzt, rt = jnp.split(
                encodings[..., :7], 7, axis=-1
            )
            extras = encodings[..., 7:]
        diag = jnp.sqrt(dxa ** 2 + dya ** 2)
        xg = xt * diag + xa
        yg = yt * diag + ya
        zg = zt * dza + za
        dxg = jnp.exp(dxt) * dxa
        dyg = jnp.exp(dyt) * dya
        dzg = jnp.exp(dzt) * dza
        if self.encode_angle_by_sincos:
            rg = jnp.arctan2(sint + jnp.sin(ra), cost + jnp.cos(ra))
        else:
            rg = rt + ra
        out = [xg, yg, zg, dxg, dyg, dzg, rg]
        if extras.shape[-1]:
            out.append(extras + anchors[..., 7:])
        return jnp.concatenate(out, axis=-1)


def limit_period(val, offset=0.5, period=jnp.pi):
    return val - jnp.floor(val / period + offset) * period


def aligned_bev_boxes(boxes):
    """[..., 7] → axis-aligned BEV [x1, y1, x2, y2]
    (box_utils.boxes3d_lidar_to_aligned_bev_boxes): dims swapped when the wrapped
    heading is closer to ±pi/2."""
    rot = jnp.abs(limit_period(boxes[..., 6], 0.5, jnp.pi))
    swap = rot > jnp.pi / 4
    dx = jnp.where(swap, boxes[..., 4], boxes[..., 3])
    dy = jnp.where(swap, boxes[..., 3], boxes[..., 4])
    return jnp.stack([
        boxes[..., 0] - dx / 2, boxes[..., 1] - dy / 2,
        boxes[..., 0] + dx / 2, boxes[..., 1] + dy / 2,
    ], axis=-1)


def nearest_bev_iou(boxes_a, boxes_b):
    """Axis-aligned nearest-BEV IoU [N, M]
    (box_utils.boxes3d_nearest_bev_iou)."""
    a = aligned_bev_boxes(boxes_a)[:, None, :]
    b = aligned_bev_boxes(boxes_b)[None, :, :]
    ix = jnp.clip(
        jnp.minimum(a[..., 2], b[..., 2]) - jnp.maximum(a[..., 0], b[..., 0]), 0
    )
    iy = jnp.clip(
        jnp.minimum(a[..., 3], b[..., 3]) - jnp.maximum(a[..., 1], b[..., 1]), 0
    )
    inter = ix * iy
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    return inter / jnp.clip(area_a + area_b - inter, 1e-6)


class PointResidualCoder:
    """Point-to-box residual coding (box_coder_utils.py:81-160): offsets relative
    to per-class mean sizes, heading as cos/sin."""

    def __init__(self, code_size=8, use_mean_size=True, mean_size=None):
        self.code_size = code_size
        self.use_mean_size = use_mean_size
        if use_mean_size:
            self.mean_size = jnp.asarray(mean_size, jnp.float32)  # [num_cls, 3]

    def encode(self, gt_boxes, points, gt_classes=None):
        """gt_boxes [..., 7+], points [..., 3], gt_classes [...] (1-indexed)."""
        g = gt_boxes.at[..., 3:6].set(jnp.clip(gt_boxes[..., 3:6], 1e-5))
        xg, yg, zg = g[..., 0], g[..., 1], g[..., 2]
        dxg, dyg, dzg, rg = g[..., 3], g[..., 4], g[..., 5], g[..., 6]
        xa, ya, za = points[..., 0], points[..., 1], points[..., 2]
        if self.use_mean_size:
            anc = self.mean_size[jnp.clip(gt_classes - 1, 0,
                                          self.mean_size.shape[0] - 1)]
            dxa, dya, dza = anc[..., 0], anc[..., 1], anc[..., 2]
            diag = jnp.sqrt(dxa ** 2 + dya ** 2)
            xt, yt, zt = (xg - xa) / diag, (yg - ya) / diag, (zg - za) / dza
            dxt = jnp.log(dxg / dxa)
            dyt = jnp.log(dyg / dya)
            dzt = jnp.log(dzg / dza)
        else:
            xt, yt, zt = xg - xa, yg - ya, zg - za
            dxt, dyt, dzt = jnp.log(dxg), jnp.log(dyg), jnp.log(dzg)
        parts = [xt, yt, zt, dxt, dyt, dzt, jnp.cos(rg), jnp.sin(rg)]
        out = jnp.stack(parts, axis=-1)
        if gt_boxes.shape[-1] > 7:
            out = jnp.concatenate([out, gt_boxes[..., 7:]], axis=-1)
        return out

    def decode(self, encodings, points, pred_classes=None):
        xt, yt, zt = encodings[..., 0], encodings[..., 1], encodings[..., 2]
        dxt, dyt, dzt = encodings[..., 3], encodings[..., 4], encodings[..., 5]
        cost, sint = encodings[..., 6], encodings[..., 7]
        xa, ya, za = points[..., 0], points[..., 1], points[..., 2]
        if self.use_mean_size:
            anc = self.mean_size[jnp.clip(pred_classes - 1, 0,
                                          self.mean_size.shape[0] - 1)]
            dxa, dya, dza = anc[..., 0], anc[..., 1], anc[..., 2]
            diag = jnp.sqrt(dxa ** 2 + dya ** 2)
            xg, yg, zg = xt * diag + xa, yt * diag + ya, zt * dza + za
            dxg = jnp.exp(dxt) * dxa
            dyg = jnp.exp(dyt) * dya
            dzg = jnp.exp(dzt) * dza
        else:
            xg, yg, zg = xt + xa, yt + ya, zt + za
            dxg, dyg, dzg = jnp.exp(dxt), jnp.exp(dyt), jnp.exp(dzt)
        rg = jnp.arctan2(sint, cost)
        parts = [xg, yg, zg, dxg, dyg, dzg, rg]
        out = jnp.stack(parts, axis=-1)
        if encodings.shape[-1] > 8:
            out = jnp.concatenate([out, encodings[..., 8:]], axis=-1)
        return out


class PointBinResidualCoder:
    """Point-to-box coding with binned heading (box_coder_utils.py:162-260,
    used by PointHeadVote/SSD3D): xyz offsets normalized by per-class mean-size
    diagonal, log dims, heading as (bin one-hot, per-bin normalized residual).
    code_size = 6 + 2 * angle_bin_num (+2 with velocity)."""

    def __init__(self, angle_bin_num=12, use_mean_size=True, mean_size=None,
                 pred_velo=False, **kwargs):
        self.angle_bin_num = int(angle_bin_num)
        self.pred_velo = bool(pred_velo)
        self.code_size = 6 + 2 * self.angle_bin_num + (2 if pred_velo else 0)
        self.use_mean_size = use_mean_size
        if use_mean_size:
            self.mean_size = jnp.asarray(mean_size, jnp.float32)  # [num_cls, 3]

    def encode_angle(self, angle):
        """angle [...] → (bin one-hot [..., N], normalized residual [..., N])."""
        two_pi = 2 * jnp.pi
        per = two_pi / self.angle_bin_num
        shifted = jnp.mod(jnp.mod(angle, two_pi) + per / 2, two_pi)
        cls = jnp.floor(shifted / per).astype(jnp.int32)
        one_hot = jax.nn.one_hot(cls, self.angle_bin_num, dtype=jnp.float32)
        res = (shifted - (cls * per + per / 2)) / per
        return one_hot, one_hot * res[..., None]

    def decode_angle(self, angle_cls, angle_res):
        """(bin logits/one-hot [..., N], residuals [..., N]) → angle [...]."""
        idx = jnp.argmax(angle_cls, axis=-1)
        one_hot = jax.nn.one_hot(idx, self.angle_bin_num, dtype=angle_res.dtype)
        res = jnp.sum(one_hot * angle_res, axis=-1)
        per = 2 * jnp.pi / self.angle_bin_num
        return (idx.astype(angle_res.dtype) + res) * per

    def encode(self, gt_boxes, points, gt_classes=None):
        """gt_boxes [..., 7+], points [..., 3], gt_classes [...] (1-indexed)."""
        g = gt_boxes.at[..., 3:6].set(jnp.clip(gt_boxes[..., 3:6], 1e-5))
        xg, yg, zg = g[..., 0], g[..., 1], g[..., 2]
        dxg, dyg, dzg, rg = g[..., 3], g[..., 4], g[..., 5], g[..., 6]
        xa, ya, za = points[..., 0], points[..., 1], points[..., 2]
        if self.use_mean_size:
            anc = self.mean_size[jnp.clip(gt_classes - 1, 0,
                                          self.mean_size.shape[0] - 1)]
            dxa, dya, dza = anc[..., 0], anc[..., 1], anc[..., 2]
            diag = jnp.sqrt(dxa ** 2 + dya ** 2)
            xt, yt, zt = (xg - xa) / diag, (yg - ya) / diag, (zg - za) / dza
            dxt = jnp.log(dxg / dxa)
            dyt = jnp.log(dyg / dya)
            dzt = jnp.log(dzg / dza)
        else:
            xt, yt, zt = xg - xa, yg - ya, zg - za
            dxt, dyt, dzt = jnp.log(dxg), jnp.log(dyg), jnp.log(dzg)
        rg_cls, rg_res = self.encode_angle(rg)
        out = jnp.concatenate(
            [jnp.stack([xt, yt, zt, dxt, dyt, dzt], axis=-1), rg_cls, rg_res],
            axis=-1,
        )
        if gt_boxes.shape[-1] > 7:
            out = jnp.concatenate([out, gt_boxes[..., 7:]], axis=-1)
        return out

    def decode(self, encodings, points, pred_classes=None):
        n = self.angle_bin_num
        xt, yt, zt = encodings[..., 0], encodings[..., 1], encodings[..., 2]
        dxt, dyt, dzt = encodings[..., 3], encodings[..., 4], encodings[..., 5]
        xa, ya, za = points[..., 0], points[..., 1], points[..., 2]
        if self.use_mean_size:
            anc = self.mean_size[jnp.clip(pred_classes - 1, 0,
                                          self.mean_size.shape[0] - 1)]
            dxa, dya, dza = anc[..., 0], anc[..., 1], anc[..., 2]
            diag = jnp.sqrt(dxa ** 2 + dya ** 2)
            xg, yg, zg = xt * diag + xa, yt * diag + ya, zt * dza + za
            dxg, dyg, dzg = (jnp.exp(dxt) * dxa, jnp.exp(dyt) * dya,
                             jnp.exp(dzt) * dza)
        else:
            xg, yg, zg = xt + xa, yt + ya, zt + za
            dxg, dyg, dzg = jnp.exp(dxt), jnp.exp(dyt), jnp.exp(dzt)
        rg = self.decode_angle(encodings[..., 6:6 + n],
                               encodings[..., 6 + n:6 + 2 * n])
        out = jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg], axis=-1)
        if self.pred_velo:
            out = jnp.concatenate(
                [out, encodings[..., 6 + 2 * n:8 + 2 * n]], axis=-1
            )
        return out
