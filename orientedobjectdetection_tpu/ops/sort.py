"""Rank-based sorting primitives for NMS-sized problems.

XLA lowers ``sort``/``argsort``/``top_k`` to a bitonic network on TPU —
measured 4.6 ms for 8x2000 f32 ``argsort`` on v5e, which dominates the
rotated-NMS hot path (the pairwise-IoU Pallas kernel itself is ~5 ms at the
same shape). For the N <= a-few-thousand candidate lists NMS works on, an
exact O(N^2) comparison rank is far cheaper on the VPU/MXU: every pair
comparison is one vectorized op, the rank is a single reduction, and the
inverse permutation falls out of a one-hot contraction (the same
serial-gather-avoiding trick as :mod:`ops.gather`).

Semantics exactly match the stable XLA sorts they replace
(``jnp.argsort(-s)`` / ``jnp.lexsort((-s, c))``): descending score,
class-major when ``class_ids`` is given, ties broken by original index.

Replaces the sort half of the CUDA ``nms_rotated`` contract (reference
``core/post_processing/bbox_nms_rotated.py:3`` sorts by score before the
suppression loop).
"""

from __future__ import annotations

import jax.numpy as jnp


def rank_desc(scores, class_ids=None):
    """Exact sorted position of every element: descending ``scores``,
    optionally class-major ascending first, stable (ties keep index order).

    Args:
        scores: (N,) float scores.
        class_ids: optional (N,) int — primary ascending key
            (the lexsort((-scores, class_ids)) ordering).

    Returns:
        rank: (N,) int32; element i lands at sorted position ``rank[i]``.
    """
    n = scores.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    s_j = scores[:, None]                 # comparand j (rows)
    s_i = scores[None, :]                 # element i (cols)
    tie = (s_j == s_i) & (idx[:, None] < idx[None, :])
    prec = (s_j > s_i) | tie              # j precedes i
    if class_ids is not None:
        c_j = class_ids[:, None]
        c_i = class_ids[None, :]
        prec = (c_j < c_i) | ((c_j == c_i) & prec)
    return prec.sum(0, dtype=jnp.int32)


def argsort_desc(scores, class_ids=None):
    """Drop-in for ``jnp.argsort(-scores)`` (or class-major
    ``jnp.lexsort((-scores, class_ids))``) built from :func:`rank_desc`.

    Returns (order, rank): ``order`` is the sorted index list, ``rank`` the
    inverse permutation (callers unscrambling a sorted result can use
    ``sorted_vals[rank]`` instead of a scatter)."""
    rank = rank_desc(scores, class_ids)
    n = rank.shape[0]
    onehot = (rank[None, :] ==
              jnp.arange(n, dtype=jnp.int32)[:, None]).astype(jnp.float32)
    order = (onehot @ jnp.arange(n, dtype=jnp.float32) + 0.5
             ).astype(jnp.int32)
    return order, rank
