"""Box coders — batched, jit-friendly.

Rebuilds the reference's coder set (``core/bbox/coder/``):

- ``DeltaXYWHAOBBoxCoder``   (delta_xywha_rbbox_coder.py:12-283)
- ``DeltaXYWHAHBBoxCoder``   (delta_xywha_hbbox_coder.py)
- ``MidpointOffsetCoder``    (delta_midpointoffset_rbbox_coder.py:13-232)
- ``DistanceAnglePointCoder``(distance_angle_point_coder.py:10-111)
- ``GVFixCoder``/``GVRatioCoder`` (gliding_vertex_coder.py)
- ``CSLCoder``               (angle_coder.py:11-114)

All functions broadcast over leading dims and contain no data-dependent
control flow, so they can live inside the jitted train/infer step.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.boxes import PI, norm_angle, obb2poly, poly2obb
from ..utils.registry import BBOX_CODERS


@BBOX_CODERS.register_module()
class DeltaXYWHAOBBoxCoder:
    """(cx,cy,w,h,a) <-> (dx,dy,dw,dh,da) with per-version options.

    Reference ``delta_xywha_rbbox_coder.py:111-283``: ``proj_xy`` projects
    the center offset into the anchor's rotated frame; ``edge_swap`` picks
    the gt (w,h,angle) representation closest in angle to the anchor;
    ``norm_factor`` divides the angle delta by ``norm_factor * pi``.
    """

    encode_size = 5

    def __init__(self,
                 target_means: Sequence[float] = (0., 0., 0., 0., 0.),
                 target_stds: Sequence[float] = (1., 1., 1., 1., 1.),
                 angle_range: str = 'oc',
                 norm_factor: Optional[float] = None,
                 edge_swap: bool = False,
                 proj_xy: bool = False,
                 add_ctr_clamp: bool = False,
                 ctr_clamp: int = 32):
        assert angle_range in ('oc', 'le90', 'le135')
        self.means = jnp.asarray(target_means, jnp.float32)
        self.stds = jnp.asarray(target_stds, jnp.float32)
        self.angle_range = angle_range
        self.norm_factor = norm_factor
        self.edge_swap = edge_swap
        self.proj_xy = proj_xy
        self.add_ctr_clamp = add_ctr_clamp
        self.ctr_clamp = ctr_clamp

    def encode(self, bboxes, gt_bboxes):
        px, py, pw, ph, pa = [bboxes[..., i] for i in range(5)]
        gx, gy, gw, gh, ga = [gt_bboxes[..., i] for i in range(5)]
        if self.proj_xy:
            dx = (jnp.cos(pa) * (gx - px) + jnp.sin(pa) * (gy - py)) / pw
            dy = (-jnp.sin(pa) * (gx - px) + jnp.cos(pa) * (gy - py)) / ph
        else:
            dx = (gx - px) / pw
            dy = (gy - py) / ph
        if self.edge_swap:
            dtheta1 = norm_angle(ga - pa, self.angle_range)
            dtheta2 = norm_angle(ga - pa + PI / 2, self.angle_range)
            take1 = jnp.abs(dtheta1) < jnp.abs(dtheta2)
            gw_r = jnp.where(take1, gw, gh)
            gh_r = jnp.where(take1, gh, gw)
            da = jnp.where(take1, dtheta1, dtheta2)
            dw = jnp.log(gw_r / pw)
            dh = jnp.log(gh_r / ph)
        else:
            da = norm_angle(ga - pa, self.angle_range)
            dw = jnp.log(gw / pw)
            dh = jnp.log(gh / ph)
        if self.norm_factor:
            da = da / (self.norm_factor * PI)
        deltas = jnp.stack([dx, dy, dw, dh, da], -1)
        return (deltas - self.means) / self.stds

    def decode(self, bboxes, pred_deltas, max_shape=None,
               wh_ratio_clip: float = 16 / 1000):
        denorm = pred_deltas * self.stds + self.means
        dx, dy, dw, dh, da = [denorm[..., i] for i in range(5)]
        if self.norm_factor:
            da = da * self.norm_factor * PI
        px, py, pw, ph, pa = [bboxes[..., i] for i in range(5)]
        max_ratio = abs(math.log(wh_ratio_clip))
        if self.add_ctr_clamp:
            dx_w = jnp.clip(pw * dx, -self.ctr_clamp, self.ctr_clamp)
            dy_h = jnp.clip(ph * dy, -self.ctr_clamp, self.ctr_clamp)
            dw = jnp.clip(dw, None, max_ratio)
            dh = jnp.clip(dh, None, max_ratio)
        else:
            dx_w = pw * dx
            dy_h = ph * dy
            dw = jnp.clip(dw, -max_ratio, max_ratio)
            dh = jnp.clip(dh, -max_ratio, max_ratio)
        gw = pw * jnp.exp(dw)
        gh = ph * jnp.exp(dh)
        if self.proj_xy:
            gx = dx * pw * jnp.cos(pa) - dy * ph * jnp.sin(pa) + px
            gy = dx * pw * jnp.sin(pa) + dy * ph * jnp.cos(pa) + py
        else:
            gx = px + dx_w
            gy = py + dy_h
        ga = norm_angle(pa + da, self.angle_range)
        if max_shape is not None:
            gx = jnp.clip(gx, 0, max_shape[1] - 1)
            gy = jnp.clip(gy, 0, max_shape[0] - 1)
        if self.edge_swap:
            long_first = gw > gh
            w_r = jnp.where(long_first, gw, gh)
            h_r = jnp.where(long_first, gh, gw)
            a_r = norm_angle(jnp.where(long_first, ga, ga + PI / 2),
                             self.angle_range)
            return jnp.stack([gx, gy, w_r, h_r, a_r], -1)
        return jnp.stack([gx, gy, gw, gh, ga], -1)


@BBOX_CODERS.register_module()
class DeltaXYWHAHBBoxCoder(DeltaXYWHAOBBoxCoder):
    """HBB anchors (theta frozen at 0 in the deltas) -> OBB decode.

    Reference ``delta_xywha_hbbox_coder.py``: identical math to the OBB coder
    except the anchor angle is implicitly 0 (HBB anchors are passed as
    (cx,cy,w,h,0) rotated form by ``hbb2obb``), and angle deltas are absolute
    angles normalized per version.
    """
    pass


@BBOX_CODERS.register_module()
class MidpointOffsetCoder:
    """Oriented R-CNN 6-param midpoint-offset encoding from HBB proposals.

    Reference ``delta_midpointoffset_rbbox_coder.py:13-232``: the gt OBB is
    represented by its circumscribed HBB deltas (dx,dy,dw,dh) plus the
    normalized offsets (da, db) of the polygon's top-most and right-most
    vertices along the HBB's top/right edges.
    """

    encode_size = 6

    def __init__(self,
                 target_means: Sequence[float] = (0., 0., 0., 0., 0., 0.),
                 target_stds: Sequence[float] = (1., 1., 1., 1., 1., 1.),
                 angle_range: str = 'le90'):
        self.means = jnp.asarray(target_means, jnp.float32)
        self.stds = jnp.asarray(target_stds, jnp.float32)
        self.version = angle_range

    def encode(self, hbb_proposals, gt_obbs):
        """hbb_proposals: (..., 4) xyxy; gt_obbs: (..., 5)."""
        px = (hbb_proposals[..., 0] + hbb_proposals[..., 2]) * 0.5
        py = (hbb_proposals[..., 1] + hbb_proposals[..., 3]) * 0.5
        pw = hbb_proposals[..., 2] - hbb_proposals[..., 0]
        ph = hbb_proposals[..., 3] - hbb_proposals[..., 1]

        polys = obb2poly(gt_obbs, self.version)
        pts = polys.reshape(polys.shape[:-1] + (4, 2))
        gx_min = pts[..., 0].min(-1)
        gx_max = pts[..., 0].max(-1)
        gy_min = pts[..., 1].min(-1)
        gy_max = pts[..., 1].max(-1)
        gx = (gx_min + gx_max) * 0.5
        gy = (gy_min + gy_max) * 0.5
        gw = gx_max - gx_min
        gh = gy_max - gy_min

        # top-most vertex (min y) x-coordinate; right-most vertex (max x) y.
        top_idx = jnp.argmin(pts[..., 1], axis=-1)
        right_idx = jnp.argmax(pts[..., 0], axis=-1)
        x_top = jnp.take_along_axis(pts[..., 0], top_idx[..., None],
                                    axis=-1)[..., 0]
        y_right = jnp.take_along_axis(pts[..., 1], right_idx[..., None],
                                      axis=-1)[..., 0]
        da = (x_top - gx) / jnp.maximum(gw, 1e-6)
        db = (y_right - gy) / jnp.maximum(gh, 1e-6)

        deltas = jnp.stack([(gx - px) / pw, (gy - py) / ph,
                            jnp.log(gw / pw), jnp.log(gh / ph), da, db], -1)
        return (deltas - self.means) / self.stds

    def decode(self, hbb_proposals, pred_deltas, max_shape=None,
               wh_ratio_clip: float = 16 / 1000):
        denorm = pred_deltas * self.stds + self.means
        dx, dy, dw, dh, da, db = [denorm[..., i] for i in range(6)]
        px = (hbb_proposals[..., 0] + hbb_proposals[..., 2]) * 0.5
        py = (hbb_proposals[..., 1] + hbb_proposals[..., 3]) * 0.5
        pw = hbb_proposals[..., 2] - hbb_proposals[..., 0]
        ph = hbb_proposals[..., 3] - hbb_proposals[..., 1]
        max_ratio = abs(math.log(wh_ratio_clip))
        dw = jnp.clip(dw, -max_ratio, max_ratio)
        dh = jnp.clip(dh, -max_ratio, max_ratio)
        gx = px + pw * dx
        gy = py + ph * dy
        gw = pw * jnp.exp(dw)
        gh = ph * jnp.exp(dh)
        da = jnp.clip(da, -0.5, 0.5)
        db = jnp.clip(db, -0.5, 0.5)
        if max_shape is not None:
            gx = jnp.clip(gx, 0, max_shape[1] - 1)
            gy = jnp.clip(gy, 0, max_shape[0] - 1)
        # Rebuild the OBB from the midpoint-offset parallelogram: vertices at
        # top (gx + da*gw, gy - gh/2), right (gx + gw/2, gy + db*gh) and
        # their reflections; then snap to the closest rectangle via poly2obb.
        x_top = gx + da * gw
        y_top = gy - gh * 0.5
        x_right = gx + gw * 0.5
        y_right = gy + db * gh
        x_bottom = gx - da * gw
        y_bottom = gy + gh * 0.5
        x_left = gx - gw * 0.5
        y_left = gy - db * gh
        polys = jnp.stack([x_top, y_top, x_right, y_right,
                           x_bottom, y_bottom, x_left, y_left], -1)
        flat = polys.reshape(-1, 8)
        obbs = poly2obb_from_parallelogram(flat)
        obbs = jnp.concatenate(
            [obbs[..., :4], norm_angle(obbs[..., 4:5], self.version)], -1)
        return obbs.reshape(pred_deltas.shape[:-1] + (5,))


def poly2obb_from_parallelogram(polys):
    """Parallelogram (midpoint-offset vertices) -> rectangle, the oriented
    R-CNN way (reference ``delta_midpointoffset_rbbox_coder.py`` decode):
    extend the shorter diagonal to the longer one's length; the four
    half-diagonal endpoints (equal diagonals, bisecting) then form the
    rectangle, which is read out edge-wise like poly2obb."""
    pts = polys.reshape(-1, 4, 2)
    ctr = pts.mean(axis=1)
    u = (pts[:, 0] - pts[:, 2]) * 0.5     # half-diagonal top->bottom
    v = (pts[:, 1] - pts[:, 3]) * 0.5     # half-diagonal right->left
    lu = jnp.linalg.norm(u, axis=-1, keepdims=True)
    lv = jnp.linalg.norm(v, axis=-1, keepdims=True)
    L = jnp.maximum(lu, lv)
    u2 = u * (L / jnp.maximum(lu, 1e-6))
    v2 = v * (L / jnp.maximum(lv, 1e-6))
    corners = jnp.stack([ctr + u2, ctr + v2, ctr - u2, ctr - v2], axis=1)
    e1 = corners[:, 1] - corners[:, 0]
    e2 = corners[:, 2] - corners[:, 1]
    l1 = jnp.linalg.norm(e1, axis=-1)
    l2 = jnp.linalg.norm(e2, axis=-1)
    long_edge = jnp.where((l1 >= l2)[:, None], e1, e2)
    ang = jnp.arctan2(long_edge[..., 1], long_edge[..., 0])
    w = jnp.maximum(l1, l2)
    h = jnp.minimum(l1, l2)
    return jnp.stack([ctr[:, 0], ctr[:, 1], w, h, ang], -1)


@BBOX_CODERS.register_module()
class DistanceAnglePointCoder:
    """FCOS/YOLOv8-style point coder: (l, t, r, b, theta) distances in the
    box's rotated frame (reference ``distance_angle_point_coder.py:10-111``).
    """

    encode_size = 5

    def __init__(self, angle_range: str = 'le90'):
        self.angle_range = angle_range

    def encode(self, points, gt_bboxes, max_dis=None, eps: float = 0.1):
        """points (..., 2); gt_bboxes (..., 5) -> (..., 5) [l,t,r,b,a]."""
        gx, gy, gw, gh, ga = [gt_bboxes[..., i] for i in range(5)]
        cos_a, sin_a = jnp.cos(ga), jnp.sin(ga)
        dx = points[..., 0] - gx
        dy = points[..., 1] - gy
        # rotate the offset into the gt frame
        ox = dx * cos_a + dy * sin_a
        oy = -dx * sin_a + dy * cos_a
        left = gw * 0.5 + ox
        right = gw * 0.5 - ox
        top = gh * 0.5 + oy
        bottom = gh * 0.5 - oy
        out = jnp.stack([left, top, right, bottom, ga], -1)
        if max_dis is not None:
            out = jnp.concatenate([
                jnp.clip(out[..., :4], 0, max_dis - eps), out[..., 4:]], -1)
        return out

    def decode(self, points, pred, max_shape=None):
        """points (..., 2); pred (..., 5) [l,t,r,b,a] -> (..., 5) boxes."""
        left, top, right, bottom, a = [pred[..., i] for i in range(5)]
        cos_a, sin_a = jnp.cos(a), jnp.sin(a)
        # center offset in the box frame, rotated back to image frame
        ox = (right - left) * 0.5
        oy = (bottom - top) * 0.5
        cx = points[..., 0] + ox * cos_a - oy * sin_a
        cy = points[..., 1] + ox * sin_a + oy * cos_a
        w = left + right
        h = top + bottom
        a = norm_angle(a, self.angle_range)
        if max_shape is not None:
            cx = jnp.clip(cx, 0, max_shape[1] - 1)
            cy = jnp.clip(cy, 0, max_shape[0] - 1)
        return jnp.stack([cx, cy, w, h, a], -1)


@BBOX_CODERS.register_module()
class GVFixCoder:
    """Gliding-vertex: encode gt polys as 4 gliding ratios along the
    circumscribed box's edges (reference ``gliding_vertex_coder.py``)."""

    encode_size = 4

    def __init__(self, angle_range: str = 'le90'):
        self.version = angle_range

    def encode(self, gt_obbs):
        polys = obb2poly(gt_obbs, self.version)
        pts = polys.reshape(polys.shape[:-1] + (4, 2))
        xmin = pts[..., 0].min(-1)
        xmax = pts[..., 0].max(-1)
        ymin = pts[..., 1].min(-1)
        ymax = pts[..., 1].max(-1)
        # vertex on each edge: top(min-y)'s x, right(max-x)'s y, etc.
        t_idx = jnp.argmin(pts[..., 1], -1)
        r_idx = jnp.argmax(pts[..., 0], -1)
        b_idx = jnp.argmax(pts[..., 1], -1)
        l_idx = jnp.argmin(pts[..., 0], -1)
        gather = lambda v, i: jnp.take_along_axis(v, i[..., None], -1)[..., 0]
        dt = (gather(pts[..., 0], t_idx) - xmin) / \
            jnp.maximum(xmax - xmin, 1e-6)
        dr = (gather(pts[..., 1], r_idx) - ymin) / \
            jnp.maximum(ymax - ymin, 1e-6)
        db = (xmax - gather(pts[..., 0], b_idx)) / \
            jnp.maximum(xmax - xmin, 1e-6)
        dl = (ymax - gather(pts[..., 1], l_idx)) / \
            jnp.maximum(ymax - ymin, 1e-6)
        return jnp.stack([dt, dr, db, dl], -1)

    def decode(self, hbbs, fix_deltas):
        """hbbs (..., 4) xyxy + ratios (..., 4) -> polys (..., 8)."""
        x1, y1, x2, y2 = [hbbs[..., i] for i in range(4)]
        w = x2 - x1
        h = y2 - y1
        dt, dr, db, dl = [fix_deltas[..., i] for i in range(4)]
        return jnp.stack([
            x1 + w * dt, y1, x2, y1 + h * dr,
            x2 - w * db, y2, x1, y2 - h * dl
        ], -1)


@BBOX_CODERS.register_module()
class GVRatioCoder:
    """Area ratio |obb| / |hbb| (gliding vertex's rectangular-ness score)."""

    encode_size = 1

    def __init__(self, angle_range: str = 'le90'):
        self.version = angle_range

    def encode(self, gt_obbs):
        polys = obb2poly(gt_obbs, self.version)
        pts = polys.reshape(polys.shape[:-1] + (4, 2))
        hbb_area = (pts[..., 0].max(-1) - pts[..., 0].min(-1)) * \
                   (pts[..., 1].max(-1) - pts[..., 1].min(-1))
        obb_area = gt_obbs[..., 2] * gt_obbs[..., 3]
        return (obb_area / jnp.maximum(hbb_area, 1e-6))[..., None]


@BBOX_CODERS.register_module()
class CSLCoder:
    """Circular Smooth Label angle coder (reference ``angle_coder.py:11-114``).

    Encodes theta into ``omega``-degree bins over the version's angle span
    with a smoothing window (gaussian/triangle/rect/pulse); decode is argmax.
    """

    def __init__(self, angle_version: str = 'le90', omega: int = 1,
                 window: str = 'gaussian', radius: float = 6):
        assert angle_version in ('oc', 'le90', 'le135')
        assert window in ('gaussian', 'triangle', 'rect', 'pulse')
        self.angle_version = angle_version
        self.omega = omega
        self.window = window
        self.radius = radius
        self.angle_range = 90 if angle_version == 'oc' else 180
        self.angle_offset_dict = {'oc': 0, 'le90': 90, 'le135': 45}
        self.angle_offset = self.angle_offset_dict[angle_version]
        self.coding_len = self.angle_range // omega

    @property
    def encode_size(self):
        return self.coding_len

    def encode(self, angle_targets):
        """(..., 1) radians -> (..., coding_len) smooth labels."""
        deg = angle_targets[..., 0] * (180 / PI) + self.angle_offset
        bin_ctr = deg / self.omega                       # fractional bin
        idx = jnp.arange(self.coding_len, dtype=jnp.float32)
        # circular distance in bins
        diff = jnp.abs(idx - bin_ctr[..., None])
        diff = jnp.minimum(diff, self.coding_len - diff)
        if self.window == 'gaussian':
            labels = jnp.exp(-(diff ** 2) / (2 * self.radius ** 2))
        elif self.window == 'triangle':
            labels = jnp.clip(1 - diff / self.radius, 0, None)
        elif self.window == 'rect':
            labels = (diff <= self.radius).astype(jnp.float32)
        else:  # pulse
            labels = (diff < 0.5).astype(jnp.float32)
        return labels

    def decode(self, angle_preds):
        """(..., coding_len) logits/scores -> (..., ) radians."""
        idx = jnp.argmax(angle_preds, axis=-1).astype(jnp.float32)
        deg = idx * self.omega + self.omega / 2 - self.angle_offset
        return deg * (PI / 180)


@BBOX_CODERS.register_module()
class DeltaXYWHBBoxCoder:
    """Axis-aligned 4-param delta coder (mmdet's) for the HBB-proposal RPN
    paths (RotatedRPNHead: gliding vertex / rotated faster r-cnn /
    roi-transformer)."""

    encode_size = 4

    def __init__(self, target_means=(0., 0., 0., 0.),
                 target_stds=(1., 1., 1., 1.)):
        self.means = jnp.asarray(target_means, jnp.float32)
        self.stds = jnp.asarray(target_stds, jnp.float32)

    def encode(self, bboxes, gt_bboxes):
        """bboxes/gt (..., 4) xyxy -> deltas."""
        px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        pw = bboxes[..., 2] - bboxes[..., 0]
        ph = bboxes[..., 3] - bboxes[..., 1]
        gx = (gt_bboxes[..., 0] + gt_bboxes[..., 2]) * 0.5
        gy = (gt_bboxes[..., 1] + gt_bboxes[..., 3]) * 0.5
        gw = gt_bboxes[..., 2] - gt_bboxes[..., 0]
        gh = gt_bboxes[..., 3] - gt_bboxes[..., 1]
        deltas = jnp.stack([(gx - px) / pw, (gy - py) / ph,
                            jnp.log(gw / pw), jnp.log(gh / ph)], -1)
        return (deltas - self.means) / self.stds

    def decode(self, bboxes, pred, max_shape=None,
               wh_ratio_clip: float = 16 / 1000):
        denorm = pred * self.stds + self.means
        dx, dy, dw, dh = [denorm[..., i] for i in range(4)]
        px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        pw = bboxes[..., 2] - bboxes[..., 0]
        ph = bboxes[..., 3] - bboxes[..., 1]
        max_ratio = abs(math.log(wh_ratio_clip))
        dw = jnp.clip(dw, -max_ratio, max_ratio)
        dh = jnp.clip(dh, -max_ratio, max_ratio)
        gx = px + pw * dx
        gy = py + ph * dy
        gw = pw * jnp.exp(dw)
        gh = ph * jnp.exp(dh)
        x1, y1 = gx - gw / 2, gy - gh / 2
        x2, y2 = gx + gw / 2, gy + gh / 2
        if max_shape is not None:
            x1 = jnp.clip(x1, 0, max_shape[1])
            y1 = jnp.clip(y1, 0, max_shape[0])
            x2 = jnp.clip(x2, 0, max_shape[1])
            y2 = jnp.clip(y2, 0, max_shape[0])
        return jnp.stack([x1, y1, x2, y2], -1)
