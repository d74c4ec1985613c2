"""Huge-image tiling: window planning + on-device merge.

Reimplements reference ``core/patch/split.py:8-75`` and
``merge_results.py:7-127``. Window planning is host-side numpy (cheap,
static); per-window detection batches and the final merge NMS run on device.
The reference loops windows with a host sync per batch
(``apis/inference.py:54-86``); our runner keeps a fixed batch shape so one
compiled program serves every tile batch, and merge is a single rotated NMS
over the concatenated (padded) per-tile detections.
"""

from __future__ import annotations

from math import ceil
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from ..ops.nms import nms_rotated


def get_multiscale_patch(sizes: Sequence[int], steps: Sequence[int],
                         ratios: Sequence[float]):
    """Expand (sizes, steps) by inverse ratios (reference
    ``split.py:8-28``): ratio r rescales the image by r, equivalent to
    windows of size/r at step/r."""
    assert len(sizes) == len(steps)
    final_sizes, final_steps = [], []
    for r in ratios:
        for s, st in zip(sizes, steps):
            final_sizes.append(int(round(s / r)))
            final_steps.append(int(round(st / r)))
    return final_sizes, final_steps


def slide_window(width: int, height: int, sizes: Sequence[int],
                 steps: Sequence[int], img_rate_thr: float = 0.6):
    """Grid of (x, y, w, h) windows covering the image; windows whose
    in-image coverage < img_rate_thr are shifted to the border (reference
    ``split.py:31-75``)."""
    windows = []
    for size, step in zip(sizes, steps):
        assert size >= step, f'size {size} < step {step}'
        x_num = 1 if width <= size else ceil((width - size) / step + 1)
        x_start = [step * i for i in range(x_num)]
        if len(x_start) > 1 and x_start[-1] + size > width:
            x_start[-1] = width - size
        y_num = 1 if height <= size else ceil((height - size) / step + 1)
        y_start = [step * i for i in range(y_num)]
        if len(y_start) > 1 and y_start[-1] + size > height:
            y_start[-1] = height - size
        for y in y_start:
            for x in x_start:
                windows.append((x, y, size, size))
    windows = np.asarray(windows, np.int64)

    # coverage rate filter
    x1 = np.clip(windows[:, 0], 0, width)
    y1 = np.clip(windows[:, 1], 0, height)
    x2 = np.clip(windows[:, 0] + windows[:, 2], 0, width)
    y2 = np.clip(windows[:, 1] + windows[:, 3], 0, height)
    img_area = (x2 - x1) * (y2 - y1)
    win_area = windows[:, 2] * windows[:, 3]
    rates = img_area / win_area
    if not (rates >= img_rate_thr).any():
        rates[rates == rates.max()] = 1
    return windows[rates >= img_rate_thr]


def translate_and_merge(per_window_dets: np.ndarray,
                        per_window_labels: np.ndarray,
                        per_window_valid: np.ndarray,
                        windows: np.ndarray,
                        num_classes: int,
                        iou_thr: float = 0.1,
                        max_out: int = 2000):
    """Merge fixed-size per-window detections into image space.

    Args:
        per_window_dets: (W, K, 6) [cx,cy,w,h,a,score].
        per_window_labels / per_window_valid: (W, K).
        windows: (W, 4) numpy (x, y, w, h).

    One rotated NMS per class over all windows (reference
    ``merge_results.py:69-127``). Returns (dets (n, 6), labels (n,)) numpy.
    """
    dets = np.asarray(per_window_dets, np.float32).copy()
    dets[..., 0] += windows[:, None, 0]
    dets[..., 1] += windows[:, None, 1]
    labels = np.asarray(per_window_labels).reshape(-1)
    valid = np.asarray(per_window_valid).reshape(-1)
    flat = dets.reshape(-1, 6)

    out_d, out_l = [], []
    for cls in range(num_classes):
        m = valid & (labels == cls)
        cd = flat[m]
        if len(cd) == 0:
            continue
        keep, _ = nms_rotated(jnp.asarray(cd[:, :5]), jnp.asarray(cd[:, 5]),
                              iou_thr)
        kept = cd[np.asarray(keep)]
        out_d.append(kept)
        out_l.append(np.full(len(kept), cls, np.int64))
    if not out_d:
        return np.zeros((0, 6), np.float32), np.zeros((0,), np.int64)
    dets = np.concatenate(out_d)
    labels = np.concatenate(out_l)
    if len(dets) > max_out:
        order = np.argsort(-dets[:, 5])[:max_out]
        dets, labels = dets[order], labels[order]
    return dets, labels
