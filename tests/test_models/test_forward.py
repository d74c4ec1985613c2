"""Config-driven forward tests (model: reference
``tests/test_models/test_forward.py:56-120``): load a real config, shrink the
backbone, fabricate inputs, run train loss + eval-mode decode. Unlike the
reference (GPU-gated), these run on CPU."""

import os.path as osp

import numpy as np
import pytest

import jax
import jax.numpy as jnp

CFG_DIR = osp.join(osp.dirname(__file__), '..', '..', 'configs')


def _shrink(model_cfg):
    model_cfg = dict(model_cfg)
    model_cfg['backbone'] = dict(type='ResNet', depth=18, num_stages=4,
                                 out_indices=(0, 1, 2, 3))
    neck = dict(model_cfg['neck'])
    neck['in_channels'] = [64, 128, 256, 512]
    neck['out_channels'] = 32
    model_cfg['neck'] = neck
    head = dict(model_cfg['bbox_head'])
    head['in_channels'] = 32
    head['feat_channels'] = 32
    if 'stacked_convs' in head:
        head['stacked_convs'] = 1
    model_cfg['bbox_head'] = head
    return model_cfg


def _demo_inputs(batch=2, size=128, num_gt=4, num_classes=15, seed=0):
    rng = np.random.default_rng(seed)
    images = jnp.asarray(rng.normal(size=(batch, size, size, 3)),
                         jnp.float32)
    cx = rng.uniform(20, size - 20, (batch, num_gt))
    cy = rng.uniform(20, size - 20, (batch, num_gt))
    w = rng.uniform(15, 40, (batch, num_gt))
    h = rng.uniform(8, 20, (batch, num_gt))
    a = rng.uniform(-np.pi / 2, np.pi / 2, (batch, num_gt))
    return dict(
        images=images,
        gt_bboxes=jnp.asarray(np.stack([cx, cy, w, h, a], -1), jnp.float32),
        gt_labels=jnp.asarray(rng.integers(0, num_classes,
                                           (batch, num_gt)), jnp.int32),
        gt_mask=jnp.ones((batch, num_gt), bool))


@pytest.mark.parametrize('cfg_name', [
    'rotated_retinanet/rotated_retinanet_obb_r50_fpn_1x_dota_le90.py',
])
def test_config_forward_train_and_infer(cfg_name):
    from orientedobjectdetection_tpu.models import build_detector
    from orientedobjectdetection_tpu.utils import Config

    cfg = Config.fromfile(osp.join(CFG_DIR, cfg_name))
    det = build_detector(_shrink(cfg.model))
    batch = _demo_inputs()
    variables = det.init(jax.random.PRNGKey(0), batch['images'])
    out = det.apply(variables, batch['images'])

    losses = det.loss_from_outputs(out, batch)
    for k, v in losses.items():
        assert np.isfinite(float(v)), f'{k} not finite'
    assert float(losses['loss_cls']) > 0

    # gradient flows through the full loss
    def total(params):
        o = det.apply({'params': params, **{k: v for k, v in
                                            variables.items()
                                            if k != 'params'}},
                      batch['images'])
        return sum(jnp.asarray(x)
                   for x in det.loss_from_outputs(o, batch).values())
    g = jax.grad(total)(variables['params'])
    gnorm = float(sum(jnp.sum(x * x) for x in jax.tree.leaves(g)) ** 0.5)
    assert np.isfinite(gnorm) and gnorm > 0

    dets, labels, valid = det.bboxes_from_outputs(out)
    assert dets.shape[-1] == 6
    assert dets.shape[0] == 2


def test_no_gt_corner_case():
    """Reference head tests check the no-gt case explicitly."""
    from orientedobjectdetection_tpu.models import build_detector
    from orientedobjectdetection_tpu.utils import Config

    cfg = Config.fromfile(osp.join(
        CFG_DIR,
        'rotated_retinanet/rotated_retinanet_obb_r50_fpn_1x_dota_le90.py'))
    det = build_detector(_shrink(cfg.model))
    batch = _demo_inputs()
    batch['gt_mask'] = jnp.zeros_like(batch['gt_mask'])
    variables = det.init(jax.random.PRNGKey(0), batch['images'])
    out = det.apply(variables, batch['images'])
    losses = det.loss_from_outputs(out, batch)
    assert float(losses['loss_bbox']) == 0
    assert float(losses['loss_cls']) > 0  # background focal loss
