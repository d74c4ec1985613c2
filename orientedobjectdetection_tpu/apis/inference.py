"""Inference entry points.

Mirrors the reference's public API (``apis/inference.py:13-94``; mmdet's
``init_detector`` / ``inference_detector``):

- :func:`init_detector` — config + checkpoint -> a ready bundle with a
  compiled inference fn.
- :func:`inference_detector` — single image (path or ndarray) -> per-class
  list of (n, 6) numpy dets (the reference's result format).
- :func:`inference_detector_by_patches` — huge-image path: plan windows,
  run fixed-shape tile batches through ONE compiled program, merge with
  rotated NMS on device (no per-tile host sync; contrast
  ``apis/inference.py:54-86`` which re-collates and re-scatters per batch).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..core.patch import get_multiscale_patch, slide_window, \
    translate_and_merge
from ..models import build_detector
from ..utils.config import Config


class DetectorBundle:
    """Built detector + params + compiled inference fn.

    ``device_norm``: optional img_norm_cfg dict. When set, the bundle
    normalizes INSIDE the compiled program (``normalize_images``) and every
    caller must feed RAW (uint8 BGR) images — the inference entry points
    below check this flag and skip their host normalization. uint8 batches
    cross to the device at 1/4 the bytes and the normalize fuses into the
    stem; at 1024 px this removes ~17 ms/img of host work (the 1-core host
    is the eval bottleneck, RESULTS.md "input pipeline")."""

    def __init__(self, cfg, detector, variables, dtype=jnp.float32,
                 mesh=None, device_norm=None):
        self.cfg = cfg
        self.detector = detector
        self.variables = variables
        self.dtype = dtype
        self.device_norm = dict(device_norm) if device_norm else None
        head = cfg.model.get('bbox_head')
        if head is None and cfg.model.get('roi_head'):  # two-stage/cascade
            head = cfg.model['roi_head']['bbox_head']
            if isinstance(head, (list, tuple)):
                head = head[-1]
        if head is None:                         # refine (S2ANet/R3Det)
            head = cfg.model.get('odm_head') or \
                (cfg.model.get('refine_heads') or [None])[-1] or \
                cfg.model.get('fam_head')
        self.num_classes = int(head['num_classes'])
        self.CLASSES = None
        # data-parallel eval over a device mesh (reference multi_gpu_test):
        # batch axis sharded, params replicated; XLA runs each shard on its
        # device, no collectives needed for inference.
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import batch_sharding, replicated
            self._data_shard = batch_sharding(mesh)
            self.variables = jax.device_put(variables, replicated(mesh))
        # variables are an ARGUMENT of the jitted fn (not a closure): they
        # can be swapped (in-training eval on live params) without stale
        # constants or a retrace.
        self._infer = jax.jit(self._infer_impl)

    def _infer_impl(self, variables, images):
        if self.device_norm is not None:
            from ..parallel.train_state import normalize_images
            images = normalize_images(images, self.device_norm)
        outputs = self.detector.apply(variables, images.astype(self.dtype))
        outputs = jax.tree.map(lambda x: x.astype(jnp.float32), outputs)
        return self.detector.bboxes_from_outputs(outputs)

    def __call__(self, images):
        if self.mesh is not None:
            images = jax.device_put(images, self._data_shard)
        return self._infer(self.variables, images)


def init_detector(config, checkpoint: Optional[str] = None,
                  dtype=jnp.float32, seed: int = 0,
                  mesh=None, device_norm=None) -> DetectorBundle:
    if isinstance(config, str):
        config = Config.fromfile(config)
    detector = build_detector(dict(config.model), dtype=dtype)
    rng = jax.random.PRNGKey(seed)
    # init at the configured test scale (static shapes)
    pad = config.get('pad_size') or (1024, 1024)
    images = jnp.zeros((1, pad[0], pad[1], 3), jnp.float32)
    variables = jax.jit(detector.init)(rng, images)
    if checkpoint is not None:
        from flax import serialization
        with open(checkpoint, 'rb') as f:
            restored = serialization.msgpack_restore(f.read())
        # accepts either a bare variables dict or a full TrainState payload
        variables = {'params': restored['params']}
        if restored.get('batch_stats'):
            variables['batch_stats'] = restored['batch_stats']
    return DetectorBundle(config, detector, variables, dtype, mesh=mesh,
                          device_norm=device_norm)


def _prep_image(img, img_norm_cfg=None):
    """Load + host-normalize. ``img_norm_cfg=None`` returns the RAW uint8
    BGR image (for device-normalizing bundles)."""
    import cv2
    if isinstance(img, str):
        img = cv2.imread(img, cv2.IMREAD_COLOR)
    if img_norm_cfg is None:
        return img
    img = img.astype(np.float32)
    mean = np.asarray(img_norm_cfg['mean'], np.float32)
    std = np.asarray(img_norm_cfg['std'], np.float32)
    if img_norm_cfg.get('to_rgb', True):
        img = img[..., ::-1]
    img = (img - mean) / std
    return img


def results_to_per_class(dets, labels, valid, num_classes: int):
    """Padded device outputs -> the reference's list-of-(n,6)-per-class."""
    dets = np.asarray(dets)
    labels = np.asarray(labels)
    valid = np.asarray(valid)
    out = []
    for c in range(num_classes):
        m = valid & (labels == c)
        out.append(dets[m])
    return out


def inference_detector(bundle: DetectorBundle, img,
                       img_norm_cfg=None) -> List[np.ndarray]:
    """Single-image inference; pads to the bundle's static size."""
    if bundle.device_norm is not None:
        img_norm_cfg = None                # bundle normalizes on device
    elif img_norm_cfg is None:
        img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                            std=[58.395, 57.12, 57.375], to_rgb=True)
    img = _prep_image(img, img_norm_cfg)
    pad = bundle.cfg.get('pad_size') or (1024, 1024)
    canvas = np.zeros((pad[0], pad[1], 3), img.dtype
                      if img.dtype == np.uint8 else np.float32)
    h = min(img.shape[0], pad[0])
    w = min(img.shape[1], pad[1])
    canvas[:h, :w] = img[:h, :w]
    dets, labels, valid = bundle(jnp.asarray(canvas[None]))
    return results_to_per_class(dets[0], labels[0], valid[0],
                                bundle.num_classes)


def inference_detector_by_patches(bundle: DetectorBundle, img,
                                  sizes: Sequence[int] = (1024,),
                                  steps: Sequence[int] = (824,),
                                  ratios: Sequence[float] = (1.0,),
                                  merge_iou_thr: float = 0.1,
                                  bs: int = 4,
                                  img_norm_cfg=None) -> List[np.ndarray]:
    """Huge-image inference (reference ``apis/inference.py:13-94``)."""
    import cv2
    if isinstance(img, str):
        img = cv2.imread(img, cv2.IMREAD_COLOR)
    if bundle.device_norm is not None:
        img_norm_cfg = None                # bundle normalizes on device
    elif img_norm_cfg is None:
        img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                            std=[58.395, 57.12, 57.375], to_rgb=True)
    height, width = img.shape[:2]
    sizes_f, steps_f = get_multiscale_patch(sizes, steps, ratios)
    windows = slide_window(width, height, sizes_f, steps_f)

    norm = _prep_image(img, img_norm_cfg)
    win_size = int(windows[:, 2].max())

    # fixed-shape tile batches -> one compiled program for all batches
    n_win = len(windows)
    n_batches = -(-n_win // bs)
    all_dets, all_labels, all_valid = [], [], []
    tile_dtype = norm.dtype if norm.dtype == np.uint8 else np.float32
    for b in range(n_batches):
        batch_wins = windows[b * bs:(b + 1) * bs]
        tiles = np.zeros((bs, win_size, win_size, 3), tile_dtype)
        for i, (x, y, w, h) in enumerate(batch_wins):
            crop = norm[y:y + h, x:x + w]
            tiles[i, :crop.shape[0], :crop.shape[1]] = crop
        dets, labels, valid = bundle(jnp.asarray(tiles))
        take = len(batch_wins)
        all_dets.append(np.asarray(dets)[:take])
        all_labels.append(np.asarray(labels)[:take])
        all_valid.append(np.asarray(valid)[:take])

    dets = np.concatenate(all_dets)
    labels = np.concatenate(all_labels)
    valid = np.concatenate(all_valid)
    merged_dets, merged_labels = translate_and_merge(
        dets, labels, valid, windows, bundle.num_classes,
        iou_thr=merge_iou_thr)
    return [merged_dets[merged_labels == c]
            for c in range(bundle.num_classes)]


def inference_detector_tta(bundle: DetectorBundle, img,
                           directions=('horizontal', 'vertical'),
                           img_norm_cfg=None,
                           version: str = 'le90') -> List[np.ndarray]:
    """Flip test-time augmentation (reference ``rotated_anchor_head.py
    :692-787`` aug_test + ``bbox_nms_rotated.py:95-144``): run the original
    and flipped images, map detections back with ``rbbox_flip``, merge with
    per-class rotated NMS."""
    import cv2
    from ..ops.boxes import rbbox_flip
    from ..ops.nms import nms_rotated_np

    if isinstance(img, str):
        img = cv2.imread(img, cv2.IMREAD_COLOR)
    variants = [(img, None)]
    for d in directions:
        flipped = img[:, ::-1] if d == 'horizontal' else img[::-1]
        variants.append((np.ascontiguousarray(flipped), d))

    all_dets = {c: [] for c in range(bundle.num_classes)}
    for im, d in variants:
        res = inference_detector(bundle, im, img_norm_cfg)
        for c, dets in enumerate(res):
            dets = np.asarray(dets, np.float32).reshape(-1, 6)
            if d is not None and len(dets):
                import jax.numpy as jnp
                # flip frame is the ACTUAL image shape, not the static pad
                # canvas — the flip was applied to the original-size image
                # before padding (reference uses img_shape from img_metas,
                # ``transforms.py:9-33``)
                mapped = np.asarray(rbbox_flip(
                    jnp.asarray(dets[:, :5]), im.shape[:2], d, version))
                dets = np.concatenate([mapped, dets[:, 5:6]], -1)
            all_dets[c].append(dets)

    out = []
    for c in range(bundle.num_classes):
        merged = np.concatenate(all_dets[c]) if all_dets[c] else \
            np.zeros((0, 6), np.float32)
        if len(merged):
            merged = merged[nms_rotated_np(merged[:, :5], merged[:, 5], 0.1)]
        out.append(merged)
    return out
