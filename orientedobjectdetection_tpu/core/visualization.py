"""Rotated-box visualization (reference ``core/visualization/image.py:40-244``).

Draws rotated polygons with cv2 (no matplotlib dependency on the hot path).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import cv2
import numpy as np

from ..ops.boxes import obb2poly_np

DOTA_PALETTE = [(165, 42, 42), (189, 183, 107), (0, 255, 0), (255, 0, 0),
                (138, 43, 226), (255, 128, 0), (255, 0, 255), (0, 255, 255),
                (255, 193, 193), (0, 51, 153), (255, 250, 205), (0, 139, 139),
                (255, 255, 0), (147, 116, 116), (0, 0, 255)]


def imshow_det_rbboxes(img, result: List[np.ndarray],
                       class_names: Optional[Sequence[str]] = None,
                       score_thr: float = 0.3,
                       thickness: int = 2,
                       font_scale: float = 0.5,
                       version: str = 'le90',
                       palette=None,
                       out_file: Optional[str] = None):
    """img: path or BGR ndarray; result: per-class list of (n, 6) dets.

    ``palette`` may be an explicit color list or a name ('dota', 'sar',
    'hrsc', 'hrsc_classwise', 'random') matching the reference demo CLIs
    (``demo/image_demo.py --palette``)."""
    if isinstance(img, str):
        img = cv2.imread(img, cv2.IMREAD_COLOR)
    img = img.copy()
    if isinstance(palette, str):
        if palette == 'random':
            rng = np.random.default_rng(42)
            palette = [tuple(int(v) for v in rng.integers(0, 255, 3))
                       for _ in range(max(len(result), 1))]
        elif palette in ('sar', 'hrsc'):
            palette = [(0, 255, 0)]
        else:                                   # dota / hrsc_classwise
            palette = DOTA_PALETTE
    palette = palette or DOTA_PALETTE
    for cls, dets in enumerate(result):
        dets = np.asarray(dets, np.float32).reshape(-1, 6)
        dets = dets[dets[:, 5] >= score_thr]
        if len(dets) == 0:
            continue
        # cv2 >= 5 rejects numpy scalars in color tuples
        color = tuple(int(v) for v in palette[cls % len(palette)])
        polys = obb2poly_np(dets, version)
        for p in polys:
            pts = p[:8].reshape(4, 2).astype(np.int32)
            cv2.polylines(img, [pts], isClosed=True, color=color,
                          thickness=thickness)
            label = class_names[cls] if class_names else str(cls)
            cv2.putText(img, f'{label}|{p[8]:.2f}',
                        (int(pts[0, 0]), int(pts[0, 1]) - 3),
                        cv2.FONT_HERSHEY_SIMPLEX, font_scale, color, 1)
    if out_file:
        cv2.imwrite(out_file, img)
    return img


def imshow_gt_det_rbboxes(img, gt_bboxes: np.ndarray,
                          gt_labels: np.ndarray,
                          result: List[np.ndarray],
                          class_names: Optional[Sequence[str]] = None,
                          score_thr: float = 0.3,
                          thickness: int = 2,
                          font_scale: float = 0.5,
                          version: str = 'le90',
                          out_file: Optional[str] = None):
    """Ground truth (left) vs detections (right), side by side (reference
    ``mmdet.core.visualization.imshow_gt_det_bboxes`` as used by
    ``tools/misc/browse_dataset.py``-style debugging).

    gt_bboxes: (n, 5) [cx, cy, w, h, theta]; gt_labels: (n,) class indices.
    """
    if isinstance(img, str):
        img = cv2.imread(img, cv2.IMREAD_COLOR)
    gt_img = img.copy()
    gt_bboxes = np.asarray(gt_bboxes, np.float32).reshape(-1, 5)
    gt_labels = np.asarray(gt_labels).reshape(-1)
    if len(gt_bboxes):
        polys = obb2poly_np(
            np.concatenate([gt_bboxes, np.ones((len(gt_bboxes), 1),
                                               np.float32)], -1), version)
        for p, cls in zip(polys, gt_labels):
            pts = p[:8].reshape(4, 2).astype(np.int32)
            color = tuple(int(v) for v in
                          DOTA_PALETTE[int(cls) % len(DOTA_PALETTE)])
            cv2.polylines(gt_img, [pts], isClosed=True, color=color,
                          thickness=thickness)
            label = (class_names[int(cls)] if class_names is not None
                     else str(int(cls)))
            cv2.putText(gt_img, label,
                        (int(pts[0, 0]), int(pts[0, 1]) - 3),
                        cv2.FONT_HERSHEY_SIMPLEX, font_scale, color, 1)
    det_img = imshow_det_rbboxes(img, result, class_names=class_names,
                                 score_thr=score_thr, thickness=thickness,
                                 font_scale=font_scale, version=version)
    sep = np.full((img.shape[0], 4, 3), 255, img.dtype)
    out = np.concatenate([gt_img, sep, det_img], axis=1)
    if out_file:
        cv2.imwrite(out_file, out)
    return out
