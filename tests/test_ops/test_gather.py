"""take_rows must equal plain fancy indexing exactly (it replaces the
scalar-loop gathers XLA emits on TPU for tiny-table lookups — see
``ops/gather.py``; reference analog: anchor-target indexing in
``mmrotate/models/dense_heads/rotated_anchor_head.py:330-360``)."""

import jax
import jax.numpy as jnp
import numpy as np

from orientedobjectdetection_tpu.ops.gather import take_rows


def test_take_rows_float_table():
    rng = np.random.default_rng(0)
    table = rng.normal(size=(32, 5)).astype(np.float32)
    idx = rng.integers(0, 32, size=4096).astype(np.int32)
    out = jax.jit(take_rows)(jnp.asarray(table), jnp.asarray(idx))
    np.testing.assert_array_equal(np.asarray(out), table[idx])


def test_take_rows_int_vector():
    rng = np.random.default_rng(1)
    table = rng.integers(-1, 15, size=(32,)).astype(np.int32)
    idx = rng.integers(0, 32, size=4096).astype(np.int32)
    out = jax.jit(take_rows)(jnp.asarray(table), jnp.asarray(idx))
    assert out.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(out), table[idx])


def test_take_rows_float_vector_and_batched_idx():
    rng = np.random.default_rng(2)
    table = rng.normal(size=(16,)).astype(np.float32)
    idx = rng.integers(0, 16, size=(4, 100)).astype(np.int32)
    out = jax.jit(take_rows)(jnp.asarray(table), jnp.asarray(idx))
    np.testing.assert_array_equal(np.asarray(out), table[idx])
