"""Ignore-region plumbing: loader truncation overflow -> assigner masking.

Reference analog: ``gt_bboxes_ignore`` through ``forward_train`` into
``MaxIoUAssigner(ignore_iof_thr)`` (mmdet semantics, reference
``rotated_anchor_head.py:181,231-239``). Round-5 motivation: on synth-hard,
36% of instances truncate at max_gt=256 and were trained as background
(RESULTS.md "single-stage starvation").
"""

import numpy as np

import jax
import jax.numpy as jnp


def test_pad_collate_overflow_to_ignore():
    from orientedobjectdetection_tpu.datasets.loader import pad_collate

    n = 12
    boxes = np.zeros((n, 5), np.float32)
    boxes[:, 0] = boxes[:, 1] = 50
    boxes[:, 2] = np.arange(10, 10 + n)          # distinct areas
    boxes[:, 3] = 10
    sample = dict(img=np.zeros((64, 64, 3), np.uint8), gt_bboxes=boxes,
                  gt_labels=np.zeros(n, np.int64))
    batch = pad_collate([sample], max_gt=8)
    assert batch['gt_mask'].sum() == 8
    assert batch['gt_ignore_mask'].sum() == n - 8
    # kept boxes are the largest-area ones; dropped go to gt_ignore
    kept_w = batch['gt_bboxes'][0, :8, 2]
    ign_w = batch['gt_ignore'][0, :n - 8, 2]
    assert kept_w.min() > ign_w.max()


def test_maxiou_assigner_ignore_masks_anchors():
    from orientedobjectdetection_tpu.core.assigners import (IGNORE,
                                                            MaxIoUAssigner)

    assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.4,
                              min_pos_iou=0, ignore_iof_thr=0.5)
    anchors = jnp.asarray([[50., 50., 20., 20., 0.],
                           [150., 150., 20., 20., 0.],
                           [250., 250., 20., 20., 0.]])
    gts = jnp.asarray([[50., 50., 20., 20., 0.]])
    ign = jnp.asarray([[150., 150., 30., 30., 0.]])
    res = assigner(anchors, gts, jnp.asarray([3]), jnp.ones(1, bool),
                   gt_bboxes_ignore=ign, gt_ignore_mask=jnp.ones(1, bool))
    a = np.asarray(res.assigned_gt_inds)
    assert a[0] == 0                    # positive to the gt
    assert a[1] == IGNORE               # inside the ignore region
    assert a[2] == -1                   # plain negative


def test_single_stage_loss_with_ignore_traces():
    """The retinanet hard-synth recipe (ignore_iof_thr set) runs its loss
    with gt_ignore in the batch; ignored anchors carry zero label weight,
    so the loss drops when an overflow box's anchors stop being
    negatives."""
    from orientedobjectdetection_tpu.models import build_detector
    from orientedobjectdetection_tpu.utils import Config

    cfg = Config.fromfile(
        'configs/rotated_retinanet/rotated_retinanet_hard_synth.py')
    model = dict(cfg.model)
    model['backbone'] = dict(type='ResNet', depth=18, num_stages=4,
                             out_indices=(0, 1, 2, 3), frozen_stages=-1)
    model['neck'] = dict(type='FPN', in_channels=[64, 128, 256, 512],
                         out_channels=32, start_level=1,
                         add_extra_convs='on_input', num_outs=5)
    model['bbox_head'] = dict(model['bbox_head'], in_channels=32,
                              feat_channels=32, stacked_convs=1)
    det = build_detector(model)
    images = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), images)
    outputs = det.apply(variables, images)

    g = jnp.asarray([[[40., 40., 16., 10., 0.3]]])
    batch = dict(gt_bboxes=g, gt_labels=jnp.zeros((1, 1), jnp.int32),
                 gt_mask=jnp.ones((1, 1), bool),
                 gt_ignore=jnp.asarray([[[90., 90., 24., 24., 0.]]]),
                 gt_ignore_mask=jnp.ones((1, 1), bool))
    losses = det.loss_from_outputs(outputs, batch)
    for v in jax.tree.leaves(losses):
        assert bool(jnp.isfinite(v).all())

    # same boxes but no ignore -> the ignore-region anchors become
    # negatives and the cls loss must be >= the masked version
    batch_noig = dict(batch)
    batch_noig.pop('gt_ignore')
    batch_noig.pop('gt_ignore_mask')
    losses_noig = det.loss_from_outputs(outputs, batch_noig)
    assert float(losses_noig['loss_cls']) >= float(losses['loss_cls'])
