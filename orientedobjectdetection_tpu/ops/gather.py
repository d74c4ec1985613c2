"""TPU-friendly gathers from tiny tables.

The assignment/target-encoding paths gather per-anchor rows from the padded
gt tables: ``gt_bboxes[assigned_idx]`` with ~200k indices into a 32-row
table. XLA lowers that gather to a serial scalar loop on TPU — measured
9 ms per (196k, 5)-from-(32, 5) gather inside the batch-8 R50 train step on
v5e, i.e. the two gathers cost more than the whole FPN. A one-hot
contraction does the same job on the MXU/VPU in ~0.1 ms and is exact (each
output row sums exactly one table row; 0/1 weights are exact in any
float precision).

Reference equivalent: plain CUDA gathers (``anchor_target`` indexing in
mmdet/mmrotate, e.g. ``rotated_anchor_head.py:330-360``) — fast on GPUs,
pathological on TPU, hence this dedicated op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def take_rows(table, idx):
    """``table[idx]`` for a tiny table and a huge index vector.

    Args:
        table: (G, K) float or (G,) int/float — G small (gt padding, <=256).
        idx: (..., N) int indices into [0, G).

    Returns:
        (..., N, K) or (..., N) matching ``table[idx]`` exactly.
    """
    g = table.shape[0]
    onehot = idx[..., None] == jnp.arange(g, dtype=idx.dtype)
    if table.ndim == 1:
        if jnp.issubdtype(table.dtype, jnp.integer) or \
                table.dtype == jnp.bool_:
            return (onehot * table).sum(-1).astype(table.dtype)
        return jnp.where(onehot, table, 0).sum(-1).astype(table.dtype)
    return jnp.einsum('...g,gk->...k', onehot.astype(table.dtype), table,
                      precision=jax.lax.Precision.HIGHEST)
