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


class TestTopkUnsorted:
    """ops.sort.topk_unsorted: exact top-k SET with no sort network."""

    def _check_set(self, scores, k):
        import jax
        import jax.numpy as jnp
        from orientedobjectdetection_tpu.ops.sort import topk_unsorted
        vals, idx = jax.jit(topk_unsorted, static_argnums=1)(scores, k)
        ref_vals, ref_idx = jax.lax.top_k(scores, k)
        # same SET of indices (ours is ascending-index, top_k score-desc)
        assert set(np.asarray(idx).tolist()) == \
            set(np.asarray(ref_idx).tolist())
        # vals are the gathered scores at idx
        np.testing.assert_array_equal(np.asarray(vals),
                                      np.asarray(scores)[np.asarray(idx)])

    def test_random(self):
        import jax.numpy as jnp
        rng = np.random.default_rng(0)
        s = jnp.asarray(rng.normal(size=20000).astype(np.float32))
        self._check_set(s, 500)

    def test_heavy_ties(self):
        # quantized scores -> many exact ties at the threshold; the set
        # must still match top_k's lowest-index tie-breaking
        import jax.numpy as jnp
        rng = np.random.default_rng(1)
        s = jnp.asarray(np.round(rng.normal(size=4096) * 3).astype(
            np.float32))
        self._check_set(s, 100)

    def test_neg_inf_padding(self):
        import jax.numpy as jnp
        rng = np.random.default_rng(2)
        raw = rng.normal(size=8192).astype(np.float32)
        raw[100:] = -1e10          # NMS padding convention
        self._check_set(jnp.asarray(raw), 256)

    def test_all_negative(self):
        import jax.numpy as jnp
        rng = np.random.default_rng(3)
        s = jnp.asarray((-np.abs(rng.normal(size=2048)) - 1).astype(
            np.float32))
        self._check_set(s, 64)

    def test_k_equals_n(self):
        import jax.numpy as jnp
        from orientedobjectdetection_tpu.ops.sort import topk_unsorted
        s = jnp.asarray(np.arange(32, dtype=np.float32))
        vals, idx = topk_unsorted(s, 32)
        np.testing.assert_array_equal(np.asarray(idx), np.arange(32))

    def test_vmap(self):
        import jax
        import jax.numpy as jnp
        from orientedobjectdetection_tpu.ops.sort import topk_unsorted
        rng = np.random.default_rng(4)
        s = jnp.asarray(rng.normal(size=(4, 8192)).astype(np.float32))
        vals, idx = jax.vmap(lambda x: topk_unsorted(x, 128))(s)
        rv, ri = jax.lax.top_k(s, 128)
        for b in range(4):
            assert set(np.asarray(idx[b]).tolist()) == \
                set(np.asarray(ri[b]).tolist())
