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
