"""DFL branch of RotatedYOLOv8Head (reference
``rotated_yolov8_head.py:191-230``): with ``reg_max > 1`` the reg tower
predicts per-side bin distributions and distances are their expectation."""

import numpy as np

import jax
import jax.numpy as jnp


def _head(reg_max):
    from orientedobjectdetection_tpu.models.dense_heads.rotated_yolov8_head \
        import RotatedYOLOv8Head
    return RotatedYOLOv8Head(
        num_classes=4, in_channels=(32, 32, 32), widen_factor=1.0,
        reg_max=reg_max, featmap_strides=(8, 16, 32),
        regress_ranges=((-1, 96), (96, 192), (192, 384)),
        test_cfg=dict(nms_pre=50, score_thr=0.05, max_per_img=10,
                      max_candidates=64, nms=dict(iou_thr=0.1)))


def test_dfl_forward_and_loss():
    head = _head(reg_max=16)
    feats = [jnp.ones((1, 8 // (2 ** i), 8 // (2 ** i), 32))
             for i in range(3)]
    variables = jax.jit(head.init)(jax.random.PRNGKey(0), feats)
    cls, boxes, angles = head.apply(variables, feats)
    # distances are expectations over [0, reg_max] bins
    for bp in boxes:
        b = np.asarray(bp)
        assert (b >= 0).all() and (b <= 16).all()

    gb = jnp.asarray([[[20., 20., 16., 8., 0.3]]])
    gl = jnp.asarray([[1]], jnp.int32)
    gm = jnp.ones((1, 1), bool)

    def total(v):
        out = head.apply(v, feats)
        losses = head.loss(out, gb, gl, gm)
        return sum(jnp.asarray(x) for x in losses.values()), losses

    (tot, losses), grads = jax.jit(
        lambda v: jax.value_and_grad(total, has_aux=True)(v))(variables)
    assert np.isfinite(float(tot))
    # gradient reaches the DFL distribution conv
    gnorm = float(sum(jnp.sum(x * x) for x in jax.tree.leaves(
        grads['params'])) ** 0.5)
    assert np.isfinite(gnorm) and gnorm > 0
    reg_kernels = [k for k in grads['params'] if k.startswith('reg_pred')]
    assert reg_kernels
    # decode path produces finite padded detections
    dets, labels, valid = jax.jit(
        lambda v: head.get_bboxes(head.apply(v, feats)))(variables)
    assert np.isfinite(np.asarray(dets)).all()
