"""Unit tests for the RepPoints-family selection machinery: the static-
shape rank-in-group selection (APAA/CFA), the Gaussian bridge
(G-RepPoints), and the SASM distance weights."""

import numpy as np

import jax
import jax.numpy as jnp


def test_rank_in_group_matches_per_group_sort():
    from orientedobjectdetection_tpu.models.dense_heads.\
        rotated_reppoints_head import rank_in_group
    rng = np.random.default_rng(0)
    n, g = 64, 5
    gid = jnp.asarray(rng.integers(0, g, n), jnp.int32)
    q = jnp.asarray(rng.normal(size=n), jnp.float32)
    valid = jnp.asarray(rng.random(n) > 0.3)
    rank = np.asarray(jax.jit(
        lambda a, b, c: rank_in_group(a, b, c, g))(gid, q, valid))
    for grp in range(g):
        m = (np.asarray(gid) == grp) & np.asarray(valid)
        idx = np.nonzero(m)[0]
        expect = np.argsort(np.argsort(np.asarray(q)[idx]))
        np.testing.assert_array_equal(rank[idx], expect)
    assert (rank[~np.asarray(valid)] == n).all()


def test_gaussian_bridge_roundtrip():
    from orientedobjectdetection_tpu.ops.boxes import (gaussian2bbox,
                                                       gt2gaussian_poly,
                                                       obb2poly, poly2obb)
    rng = np.random.default_rng(1)
    obb = jnp.asarray(np.stack([
        rng.uniform(50, 80, 16), rng.uniform(50, 80, 16),
        rng.uniform(10, 40, 16), rng.uniform(5, 25, 16),
        rng.uniform(-0.7, 1.4, 16)], -1), jnp.float32)
    polys = obb2poly(obb, 'le135')
    canon = poly2obb(polys, 'le135')
    mu, sig = gt2gaussian_poly(polys)
    rec = poly2obb(gaussian2bbox(mu, sig), 'le135')
    np.testing.assert_allclose(np.asarray(rec[:, :4]),
                               np.asarray(canon[:, :4]), atol=1e-3)


def test_sampling_edge_points_endpoints():
    from orientedobjectdetection_tpu.models.dense_heads.\
        rotated_reppoints_head import sampling_edge_points
    poly = jnp.asarray([[0., 0., 10., 0., 10., 4., 0., 4.]])
    pts = np.asarray(sampling_edge_points(poly, 5))[0]   # (20, 2)
    assert pts.shape == (20, 2)
    # first sample of each edge is the corner itself
    np.testing.assert_allclose(pts[0], [0, 0])
    np.testing.assert_allclose(pts[5], [10, 0])
    np.testing.assert_allclose(pts[10], [10, 4])
    np.testing.assert_allclose(pts[15], [0, 4])


def test_sas_assigner_positive_inside():
    from orientedobjectdetection_tpu.core.assigners import SASAssigner
    from orientedobjectdetection_tpu.ops.boxes import obb2poly
    # one gt, pointsets: one tightly matching the gt, others far away
    gt = jnp.asarray([[32., 32., 20., 10., 0.3]])
    gt_polys = obb2poly(gt, 'oc')
    n = 16
    rng = np.random.default_rng(2)
    base = np.asarray(obb2poly(gt, 'oc'))[0].reshape(4, 2)
    good = np.concatenate([base, base[:4], base[:1]], 0)[:9]  # on the gt
    sets = rng.uniform(200, 300, (n, 9, 2)).astype(np.float32)
    sets[0] = good
    sets[1] = good + rng.normal(0, 0.5, (9, 2))
    assigner = SASAssigner(topk=4)
    res = assigner(jnp.asarray(sets.reshape(n, 18)), [n], gt_polys,
                   jnp.asarray([3]), jnp.asarray([True]))
    assigned = np.asarray(res.assigned_gt_inds)
    assert assigned[0] == 0            # matching set is positive
    assert (assigned[2:] == -1).all()  # far sets are negatives
    assert np.asarray(res.labels)[0] == 3


def test_kfiou_shared2fc_bbox_head_loss():
    """RotatedKFIoUShared2FCBBoxHead (roi_trans_kfiou configs): loss is
    finite and gradients flow through the KFLoss decode path."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from orientedobjectdetection_tpu.models.roi_heads.bbox_heads import \
        RotatedKFIoUShared2FCBBoxHead

    head = RotatedKFIoUShared2FCBBoxHead(
        num_classes=4, in_channels=8, fc_out_channels=32,
        reg_class_agnostic=False,
        bbox_coder=dict(type='DeltaXYWHAOBBoxCoder', angle_range='le90',
                        norm_factor=None, edge_swap=True, proj_xy=True,
                        target_means=(0., 0., 0., 0., 0.),
                        target_stds=(0.05, 0.05, 0.1, 0.1, 0.5)),
        loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False),
        loss_bbox=dict(type='KFLoss', fun='ln', loss_weight=5.0))
    B, R = 1, 8
    feats = jnp.ones((B, R, 7, 7, 8))
    variables = jax.jit(head.init)(jax.random.PRNGKey(0), feats)
    rois = jnp.tile(jnp.asarray([[30., 30., 20., 10., 0.2]]), (B, R, 1))
    labels = jnp.zeros((B, R), jnp.int32).at[:, 4:].set(4)
    lw = jnp.ones((B, R))
    bt = jnp.zeros((B, R, 5)).at[..., 2:4].set(0.1)
    bw = jnp.zeros((B, R)).at[:, :4].set(1.0)

    def total(v):
        cls_score, bbox_pred = head.apply(v, feats)
        losses = head.loss(cls_score, bbox_pred, rois, labels, lw, bt, bw,
                           jnp.asarray(4.0))
        return sum(jnp.asarray(x) for x in losses.values())

    tot, grads = jax.jit(jax.value_and_grad(total))(variables)
    assert np.isfinite(float(tot))
    gnorm = float(sum(jnp.sum(x * x)
                      for x in jax.tree.leaves(grads['params'])) ** 0.5)
    assert np.isfinite(gnorm) and gnorm > 0
