"""Single-stage rotated detector (reference ``detectors/single_stage.py:10-139``).

A flax module for the network (backbone -> neck -> head) plus pure-function
train/inference logic. The batched pipeline contract (everything padded,
masks carried explicitly):

    batch = {
        'images':    (B, H, W, 3)   float,
        'gt_bboxes': (B, G, 5)      float,
        'gt_labels': (B, G)         int32,
        'gt_mask':   (B, G)         bool,
    }
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import BACKBONES, DETECTORS, HEADS, NECKS


@DETECTORS.register_module()
class RotatedSingleStageDetector(nn.Module):
    backbone: Optional[dict] = None
    neck: Optional[dict] = None
    bbox_head: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.nowrap
    def make_head(self):
        """Build the head module object (cheap dataclass; used both inside
        apply for the forward and outside for loss/decode logic)."""
        cfg = dict(self.bbox_head)
        if cfg.get('train_cfg') is None:
            cfg['train_cfg'] = self.train_cfg
        if cfg.get('test_cfg') is None:
            cfg['test_cfg'] = self.test_cfg
        return HEADS.build(cfg, dtype=self.dtype)

    @nn.compact
    def __call__(self, images, batch=None, train: bool = False, rng=None):
        # batch/train/rng accepted for interface parity with two-stage
        # detectors (single-stage target assignment happens in the loss).
        x = BACKBONES.build(dict(self.backbone), dtype=self.dtype,
                            name='backbone')(images)
        if self.neck is not None:
            x = NECKS.build(dict(self.neck), dtype=self.dtype, name='neck')(x)
        cfg = dict(self.bbox_head)
        if cfg.get('train_cfg') is None:
            cfg['train_cfg'] = self.train_cfg
        if cfg.get('test_cfg') is None:
            cfg['test_cfg'] = self.test_cfg
        return HEADS.build(cfg, dtype=self.dtype, name='bbox_head')(x)

    # ---- functional logic (no params) ----------------------------------
    @nn.nowrap
    def loss_from_outputs(self, outputs, batch):
        head = self.make_head()
        import inspect
        accepts_ignore = 'gt_ignore' in inspect.signature(
            type(head).loss).parameters
        if 'gt_ignore' in batch and accepts_ignore:
            # anchor-head family: route ignore regions (dataset ignore
            # boxes / loader truncation overflow) to the assigner
            return head.loss(outputs, batch['gt_bboxes'],
                             batch['gt_labels'], batch['gt_mask'],
                             gt_ignore=batch['gt_ignore'],
                             gt_ignore_mask=batch['gt_ignore_mask'])
        return head.loss(outputs, batch['gt_bboxes'],
                         batch['gt_labels'], batch['gt_mask'])

    @nn.nowrap
    def bboxes_from_outputs(self, outputs, img_shape=None, scale_factor=None,
                            rescale=False, cfg=None):
        head = self.make_head()
        return head.get_bboxes(outputs, img_shape=img_shape,
                               scale_factor=scale_factor, rescale=rescale,
                               cfg=cfg)


@DETECTORS.register_module()
class RotatedRetinaNet(RotatedSingleStageDetector):
    """Thin alias (reference ``detectors/rotated_retinanet.py``)."""
    pass

@DETECTORS.register_module()
class RotatedFCOS(RotatedSingleStageDetector):
    """Thin alias (reference ``detectors/rotated_fcos.py``)."""
    pass

@DETECTORS.register_module()
class RotatedYOLOv8(RotatedSingleStageDetector):
    """Thin alias (reference ``detectors/rotated_yolov8.py:7-17``)."""
    pass

@DETECTORS.register_module()
class RotatedRepPoints(RotatedSingleStageDetector):
    """Thin alias (reference ``detectors/rotated_reppoints.py``)."""
    pass
