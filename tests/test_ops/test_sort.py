"""ops.sort rank-based argsort must exactly match XLA's stable sorts."""

import numpy as np

import jax.numpy as jnp

from orientedobjectdetection_tpu.ops.sort import argsort_desc, rank_desc


def test_matches_stable_argsort_with_ties():
    rng = np.random.default_rng(0)
    for n in (1, 7, 130, 500):
        # heavy ties (including the NEG_INF padding pattern)
        s = rng.choice([0.1, 0.2, 0.3, -1e10], size=n).astype(np.float32)
        order, rank = argsort_desc(jnp.asarray(s))
        ref = np.asarray(jnp.argsort(-jnp.asarray(s), stable=True))
        np.testing.assert_array_equal(np.asarray(order), ref)
        # rank is the inverse permutation
        np.testing.assert_array_equal(np.asarray(order)[np.asarray(rank)],
                                      np.arange(n))


def test_matches_lexsort_class_major():
    rng = np.random.default_rng(1)
    n = 300
    s = rng.choice([0.5, 0.25, 0.75, -1e10], size=n).astype(np.float32)
    c = rng.integers(0, 6, size=n).astype(np.int32)
    order, _ = argsort_desc(jnp.asarray(s), jnp.asarray(c))
    ref = np.asarray(jnp.lexsort((-jnp.asarray(s), jnp.asarray(c))))
    np.testing.assert_array_equal(np.asarray(order), ref)


def test_rank_desc_values():
    s = jnp.asarray([0.2, 0.9, 0.2, 0.5])
    # sorted: [0.9(idx1), 0.5(idx3), 0.2(idx0), 0.2(idx2)]
    np.testing.assert_array_equal(np.asarray(rank_desc(s)), [2, 0, 3, 1])
