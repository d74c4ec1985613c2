"""Host-side data pipeline transforms (numpy/cv2).

Reimplements the reference's pipeline set (``datasets/pipelines/transforms.py``,
``loading.py``) as plain callables over a results dict, with one structural
change for TPU: the terminal ``PadToBatch`` transform emits *fixed-shape*
padded tensors (image padded to a static size; gts padded to ``max_gt`` with
a validity mask) so the device step never sees a dynamic shape.

results dict keys (subset of mmcv's): img (H,W,3 float32 BGR->RGB),
img_shape, ori_shape, pad_shape, scale_factor, gt_bboxes (N,5), gt_labels
(N,), filename.
"""

from __future__ import annotations

import os.path as osp
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

from ..ops.boxes import norm_angle, obb2poly_np, poly2obb_np
from ..utils.registry import PIPELINES


@PIPELINES.register_module()
class LoadImageFromFile:
    def __init__(self, to_float32: bool = False, color_type: str = 'color'):
        self.to_float32 = to_float32

    def __call__(self, results):
        path = results.get('img_prefix')
        fname = results['img_info']['filename']
        full = osp.join(path, fname) if path else fname
        img = cv2.imread(full, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(full)
        if self.to_float32:
            img = img.astype(np.float32)
        results['filename'] = full
        results['ori_filename'] = fname
        results['img'] = img
        results['img_shape'] = img.shape
        results['ori_shape'] = img.shape
        results['scale_factor'] = np.array([1., 1., 1., 1.], np.float32)
        return results


@PIPELINES.register_module()
class LoadAnnotations:
    def __init__(self, with_bbox: bool = True, with_label: bool = True):
        self.with_bbox = with_bbox
        self.with_label = with_label

    def __call__(self, results):
        ann = results['ann_info']
        if self.with_bbox:
            results['gt_bboxes'] = ann['bboxes'].astype(np.float32).copy()
            results['gt_bboxes_ignore'] = ann.get(
                'bboxes_ignore', np.zeros((0, 5), np.float32)).copy()
        if self.with_label:
            results['gt_labels'] = ann['labels'].astype(np.int64).copy()
        return results


def rescale_size(old_size, scale):
    """mmcv-style keep-ratio target size."""
    w, h = old_size
    if isinstance(scale, (int, float)):
        factor = scale
    else:
        max_long, max_short = max(scale), min(scale)
        factor = min(max_long / max(h, w), max_short / min(h, w))
    return int(w * factor + 0.5), int(h * factor + 0.5)


@PIPELINES.register_module()
class RResize:
    """Keep-ratio resize; rotated boxes scale centers by (sx, sy) and sides
    by sqrt(sx*sy) (reference ``transforms.py:38-48``)."""

    def __init__(self, img_scale=None, multiscale_mode='range',
                 ratio_range=None):
        self.img_scale = img_scale

    def __call__(self, results):
        img = results['img']
        h, w = img.shape[:2]
        scale = results.get('scale', self.img_scale)
        if isinstance(scale, list):
            scale = scale[0]
        new_w, new_h = rescale_size((w, h), scale)
        resized = cv2.resize(img, (new_w, new_h),
                             interpolation=cv2.INTER_LINEAR)
        w_scale = new_w / w
        h_scale = new_h / h
        results['img'] = resized
        results['img_shape'] = resized.shape
        results['scale_factor'] = np.array(
            [w_scale, h_scale, w_scale, h_scale], np.float32)
        for key in ('gt_bboxes', 'gt_bboxes_ignore'):
            if key in results and len(results[key]):
                b = results[key]
                b[:, 0] *= w_scale
                b[:, 1] *= h_scale
                b[:, 2:4] *= np.sqrt(w_scale * h_scale)
                results[key] = b
        return results


@PIPELINES.register_module()
class RRandomFlip:
    """Random flip with per-version angle remap
    (reference ``transforms.py:51-98``)."""

    def __init__(self, flip_ratio=None, direction='horizontal',
                 version: str = 'oc'):
        self.flip_ratio = flip_ratio
        self.direction = direction
        self.version = version

    def bbox_flip(self, bboxes, img_shape, direction):
        flipped = bboxes.copy()
        if direction == 'horizontal':
            flipped[:, 0] = img_shape[1] - bboxes[:, 0] - 1
        elif direction == 'vertical':
            flipped[:, 1] = img_shape[0] - bboxes[:, 1] - 1
        elif direction == 'diagonal':
            flipped[:, 0] = img_shape[1] - bboxes[:, 0] - 1
            flipped[:, 1] = img_shape[0] - bboxes[:, 1] - 1
            return flipped
        else:
            raise ValueError(direction)
        if self.version == 'oc':
            rot = bboxes[:, 4] != np.pi / 2
            flipped[rot, 4] = np.pi / 2 - bboxes[rot, 4]
            flipped[rot, 2] = bboxes[rot, 3]
            flipped[rot, 3] = bboxes[rot, 2]
        else:
            flipped[:, 4] = norm_angle(np.pi - bboxes[:, 4], self.version)
        return flipped

    def __call__(self, results):
        if 'flip' not in results:
            flip = np.random.rand() < (self.flip_ratio or 0)
            results['flip'] = bool(flip)
            results['flip_direction'] = self.direction
        if results['flip']:
            results['img'] = np.ascontiguousarray(
                np.flip(results['img'],
                        axis=1 if results['flip_direction'] != 'vertical'
                        else 0))
            if results['flip_direction'] == 'diagonal':
                results['img'] = np.ascontiguousarray(
                    np.flip(results['img'], axis=0))
            for key in ('gt_bboxes', 'gt_bboxes_ignore'):
                if key in results and len(results[key]):
                    results[key] = self.bbox_flip(
                        results[key], results['img_shape'],
                        results['flip_direction'])
        return results


@PIPELINES.register_module()
class PolyRandomRotate:
    """Random rotation through the poly round-trip
    (reference ``transforms.py:101-277``): rotate the image with warpAffine,
    push gt boxes through obb->poly->rotate->poly2obb, snap rect-classes to
    multiples of 90 deg, drop boxes whose center leaves the image or whose
    side < 5 px."""

    def __init__(self, rotate_ratio: float = 0.5, mode: str = 'range',
                 angles_range=180, auto_bound: bool = False,
                 rect_classes=None, allow_negative: bool = False,
                 version: str = 'le90'):
        assert mode in ('range', 'value')
        self.rotate_ratio = rotate_ratio
        self.mode = mode
        self.angles_range = angles_range
        self.auto_bound = auto_bound
        self.rect_classes = rect_classes or []
        self.allow_negative = allow_negative
        self.version = version
        self.discrete_range = [90, 180, -90, -180]

    def __call__(self, results):
        if np.random.rand() >= self.rotate_ratio:
            angle = 0.0
            results['rotate'] = False
        else:
            results['rotate'] = True
            if self.mode == 'range':
                angle = float(self.angles_range) * (2 * np.random.rand() - 1)
            else:
                angle = float(np.random.choice(self.angles_range))
            if self.rect_classes and any(
                    int(c) in self.rect_classes
                    for c in results.get('gt_labels', [])):
                angle = float(np.random.choice(self.discrete_range))
        results['rotate_angle'] = angle

        h, w = results['img'].shape[:2]
        c = results['img'].shape[2] if results['img'].ndim == 3 else 1
        center = (w / 2, h / 2)
        abs_cos = abs(np.cos(np.radians(angle)))
        abs_sin = abs(np.sin(np.radians(angle)))
        if self.auto_bound:
            bound_w = int(round(h * abs_sin + w * abs_cos))
            bound_h = int(round(h * abs_cos + w * abs_sin))
        else:
            bound_w, bound_h = w, h
        rm = cv2.getRotationMatrix2D(center, angle, 1)
        if self.auto_bound:
            rm[0, 2] += bound_w / 2 - center[0]
            rm[1, 2] += bound_h / 2 - center[1]
        results['img'] = cv2.warpAffine(results['img'], rm,
                                        (bound_w, bound_h))
        results['img_shape'] = (bound_h, bound_w, c)

        gt = results.get('gt_bboxes', np.zeros((0, 5), np.float32))
        labels = results.get('gt_labels', np.zeros((0,), np.int64))
        if len(gt):
            with_score = np.concatenate(
                [gt, np.zeros((gt.shape[0], 1), np.float32)], -1)
            polys = obb2poly_np(with_score, self.version)[:, :8]
            pts = polys.reshape(-1, 2)
            pts = cv2.transform(pts[:, None, :].astype(np.float64),
                                rm)[:, 0, :]
            polys = pts.reshape(-1, 8)
            obbs = []
            for p in polys:
                o = poly2obb_np(p.astype(np.float32), self.version)
                obbs.append(o if o is not None else (0, 0, 0, 0, 0))
            gt = np.asarray(obbs, np.float32)
            keep = (gt[:, 0] > 0) & (gt[:, 0] < bound_w) & \
                   (gt[:, 1] > 0) & (gt[:, 1] < bound_h) & \
                   (gt[:, 2] > 5) & (gt[:, 3] > 5)
            gt = gt[keep]
            labels = labels[keep]
        if len(gt) == 0 and not self.allow_negative:
            return None
        results['gt_bboxes'] = gt
        results['gt_labels'] = labels
        return results


@PIPELINES.register_module()
class Normalize:
    def __init__(self, mean, std, to_rgb: bool = True):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_rgb = to_rgb

    def __call__(self, results):
        img = results['img'].astype(np.float32)
        if self.to_rgb:
            img = img[..., ::-1]
        results['img'] = (img - self.mean) / self.std
        results['img_norm_cfg'] = dict(mean=self.mean, std=self.std,
                                       to_rgb=self.to_rgb)
        return results


@PIPELINES.register_module()
class Pad:
    def __init__(self, size: Optional[Tuple[int, int]] = None,
                 size_divisor: Optional[int] = None, pad_val: float = 0):
        self.size = size
        self.size_divisor = size_divisor
        self.pad_val = pad_val

    def __call__(self, results):
        img = results['img']
        h, w = img.shape[:2]
        if self.size is not None:
            th, tw = self.size
        else:
            d = self.size_divisor
            th, tw = -(-h // d) * d, -(-w // d) * d
        padded = np.full((th, tw) + img.shape[2:], self.pad_val, img.dtype)
        padded[:h, :w] = img
        results['img'] = padded
        results['pad_shape'] = padded.shape
        return results


@PIPELINES.register_module()
class DefaultFormatBundle:
    def __call__(self, results):
        return results


@PIPELINES.register_module()
class Collect:
    def __init__(self, keys: Sequence[str],
                 meta_keys=('filename', 'ori_filename', 'ori_shape',
                            'img_shape', 'pad_shape', 'scale_factor', 'flip',
                            'flip_direction')):
        self.keys = keys
        self.meta_keys = meta_keys

    def __call__(self, results):
        out = {k: results[k] for k in self.keys if k in results}
        out['img_metas'] = {k: results.get(k) for k in self.meta_keys}
        return out


@PIPELINES.register_module()
class MultiScaleFlipAug:
    """Test-time wrapper; single-scale no-flip fast path (TTA variants later).
    """

    def __init__(self, transforms, img_scale=None, flip=False,
                 flip_direction='horizontal'):
        self.transforms = Compose(transforms)
        self.img_scale = img_scale if isinstance(img_scale, list) \
            else [img_scale]
        self.flip = flip
        self.flip_direction = flip_direction

    def __call__(self, results):
        outs = []
        for scale in self.img_scale:
            r = dict(results)
            r['scale'] = scale
            r['flip'] = False
            r['flip_direction'] = None
            outs.append(self.transforms(r))
        return outs[0] if len(outs) == 1 else outs


class Compose:
    def __init__(self, transforms):
        self.transforms = []
        for t in transforms:
            if isinstance(t, dict):
                self.transforms.append(PIPELINES.build(dict(t)))
            else:
                self.transforms.append(t)

    def __call__(self, results):
        for t in self.transforms:
            results = t(results)
            if results is None:
                return None
        return results
