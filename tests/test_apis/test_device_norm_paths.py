"""Device-norm end-to-end parity: a bundle/train-step normalizing raw uint8
batches on device must match the host-normalized path exactly (same f32
ops, different executor)."""

import numpy as np

import jax
import jax.numpy as jnp

NORM = dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375],
            to_rgb=True)


def _tiny_detector():
    from orientedobjectdetection_tpu.models import build_detector
    return build_detector(dict(
        type='RotatedRetinaNet',
        backbone=dict(type='ResNet', depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3)),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_input', num_outs=5),
        bbox_head=dict(
            type='RotatedRetinaHead', num_classes=4, in_channels=32,
            feat_channels=32, stacked_convs=1,
            anchor_generator=dict(
                type='RotatedAnchorGenerator', octave_base_scale=4,
                scales_per_octave=1, ratios=[1.0],
                strides=[8, 16, 32, 64, 128]),
            bbox_coder=dict(type='DeltaXYWHAOBBoxCoder',
                            angle_range='le90'),
            loss_cls=dict(type='FocalLoss', use_sigmoid=True),
            loss_bbox=dict(type='L1Loss')),
        train_cfg=dict(assigner=dict(
            type='MaxIoUAssigner', pos_iou_thr=0.5, neg_iou_thr=0.4,
            min_pos_iou=0)),
        test_cfg=dict(nms_pre=100, score_thr=0.05, max_per_img=10,
                      nms=dict(iou_thr=0.1))))


def _host_normalize(imgs_u8):
    x = imgs_u8.astype(np.float32)[..., ::-1]
    mean = np.asarray(NORM['mean'], np.float32)
    std = np.asarray(NORM['std'], np.float32)
    return (x - mean) / std


def test_bundle_device_norm_matches_host():
    from orientedobjectdetection_tpu.apis.inference import DetectorBundle
    from orientedobjectdetection_tpu.utils import Config
    det = _tiny_detector()
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (1, 64, 64, 3), np.uint8)
    variables = jax.jit(det.init)(jax.random.PRNGKey(0),
                                  jnp.asarray(_host_normalize(raw)))
    cfg = Config(dict(model=dict(bbox_head=dict(num_classes=4)),
                      pad_size=(64, 64)))
    host = DetectorBundle(cfg, det, variables)
    dev = DetectorBundle(cfg, det, variables, device_norm=NORM)
    d_host, l_host, v_host = host(jnp.asarray(_host_normalize(raw)))
    d_dev, l_dev, v_dev = dev(jnp.asarray(raw))
    np.testing.assert_array_equal(np.asarray(v_host), np.asarray(v_dev))
    np.testing.assert_array_equal(np.asarray(l_host), np.asarray(l_dev))
    np.testing.assert_allclose(np.asarray(d_host), np.asarray(d_dev),
                               rtol=1e-5, atol=1e-5)


def test_train_step_device_norm_matches_host():
    import optax
    from orientedobjectdetection_tpu.parallel.train_state import (
        TrainState, make_train_step)
    det = _tiny_detector()
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 256, (2, 64, 64, 3), np.uint8)
    g = 3
    gt = dict(
        gt_bboxes=jnp.asarray(np.stack([
            rng.uniform(16, 48, (2, g)), rng.uniform(16, 48, (2, g)),
            rng.uniform(10, 24, (2, g)), rng.uniform(6, 14, (2, g)),
            rng.uniform(-1.5, 1.5, (2, g))], -1), jnp.float32),
        gt_labels=jnp.asarray(rng.integers(0, 4, (2, g)), jnp.int32),
        gt_mask=jnp.ones((2, g), bool))
    variables = jax.jit(det.init)(jax.random.PRNGKey(0),
                                  jnp.asarray(_host_normalize(raw[:1])))
    tx = optax.sgd(0.01, momentum=0.9)

    def one_step(device_norm, images):
        params = jax.tree.map(jnp.copy, variables['params'])
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=jax.tree.map(
                               jnp.copy, variables.get('batch_stats', {})),
                           opt_state=tx.init(params))
        step = jax.jit(make_train_step(det, tx, device_norm=device_norm))
        _, metrics = step(state, dict(gt, images=images))
        return float(metrics['loss'])

    loss_host = one_step(None, jnp.asarray(_host_normalize(raw)))
    loss_dev = one_step(NORM, jnp.asarray(raw))
    np.testing.assert_allclose(loss_dev, loss_host, rtol=1e-5)
