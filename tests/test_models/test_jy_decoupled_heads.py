"""Structural + forward/loss tests for the jy decoupled-objectness heads.

Reference tower topology (``rotated_objectness_head.py``):
- ``RotatedDecoupledBGHead`` / base (:23, ``_init_layers`` :93-178): the
  objectness branch has its OWN two-ConvModule 3x3 tower ending in a 1x1
  conv -> 1 channel, fully decoupled from the classification tower.
- ``RotatedDecoupled1x1ObjHead`` (:385, ``_init_layers`` :448-530): obj and
  fg(cls) SHARE the classification tower and decouple only at 1x1 predictor
  convs (``forward_single``: ``cls_logit = cls_pred(x)``;
  ``obj = obj_pred(cls_logit)``; ``fg = fg_pred(cls_logit)``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _feats(key=0, b=2):
    rng = np.random.RandomState(key)
    return tuple(jnp.asarray(rng.rand(b, s, s, c), jnp.float32)
                 for s, c in ((16, 64), (8, 128), (4, 192)))


def _make(cls):
    return cls(num_classes=3, in_channels=(64, 128, 192),
               featmap_strides=(8, 16, 32))


@pytest.fixture(scope='module')
def heads():
    from orientedobjectdetection_tpu.models.dense_heads.jy_heads import (
        RotatedDecoupled1x1ObjHead, RotatedDecoupledObjHead)
    base = _make(RotatedDecoupledObjHead)
    one = _make(RotatedDecoupled1x1ObjHead)
    feats = _feats()
    vb = base.init(jax.random.PRNGKey(0), feats)
    vo = one.init(jax.random.PRNGKey(0), feats)
    return base, vb, one, vo, feats


def test_base_head_has_separate_obj_tower(heads):
    _, vb, _, vo, _ = heads
    pb = set(vb['params'])
    # base: own 3x3 tower per level feeding the 1x1 obj predictor
    assert {'obj_conv_0_0', 'obj_conv_0_1', 'obj_pred_0'} <= pb
    # 1x1 variant: NO separate obj tower — decouples at the 1x1 convs only
    po = set(vo['params'])
    assert not any(k.startswith('obj_conv') for k in po)
    assert {'cls_conv_0_0', 'cls_conv_0_1', 'fg_pred_0', 'obj_pred_0'} <= po


def test_1x1_head_shares_cls_tower(heads):
    _, _, one, vo, _ = heads
    # both 1x1 predictors consume the shared tower's cls_out channels
    fg_k = vo['params']['fg_pred_0']['kernel']
    obj_k = vo['params']['obj_pred_0']['kernel']
    assert fg_k.shape[:2] == (1, 1) and obj_k.shape[:2] == (1, 1)
    assert fg_k.shape[2] == obj_k.shape[2]  # same input feature


def test_forward_shapes_and_loss(heads):
    base, vb, one, vo, feats = heads
    for head, v in ((base, vb), (one, vo)):
        cls, box, ang, obj = head.apply(v, feats)
        assert [c.shape for c in cls] == [(2, 16, 16, 3), (2, 8, 8, 3),
                                          (2, 4, 4, 3)]
        assert [o.shape[-1] for o in obj] == [1, 1, 1]
        gt_b = jnp.tile(jnp.asarray([[40., 40., 20., 10., 0.3]]), (2, 4, 1))
        gt_l = jnp.zeros((2, 4), jnp.int32)
        gt_m = jnp.asarray([[True, True, False, False]] * 2)
        losses = head.loss((cls, box, ang, obj), gt_b, gt_l, gt_m)
        for val in losses.values():
            assert np.isfinite(float(val))


def test_variants_differ_in_structure(heads):
    base, vb, one, vo, _ = heads
    nb = sum(x.size for x in jax.tree.leaves(vb['params']))
    no = sum(x.size for x in jax.tree.leaves(vo['params']))
    assert nb > no  # the separate obj tower costs extra parameters
