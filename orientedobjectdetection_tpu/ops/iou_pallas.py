"""Pallas TPU kernel: tiled pairwise rotated IoU.

STATUS: numerically validated against ops.iou in interpreter mode (distinct
pairs within 2e-3; coincident-geometry self-pairs are fp32-sensitive in the
global evaluation frame and can deviate — such pairs are never consumed by
NMS/assignment). Mosaic compilation currently HANGS in this image's axon
remote-compile service, so the jnp path (ops.iou) remains the production
default; flip the dispatch here once the service handles Mosaic kernels.

The jnp implementation (:mod:`ops.iou`) materializes per-pair intermediates
in HBM between fusion boundaries; this kernel keeps everything for a
(TILE_N x TILE_M) tile in VMEM, streaming only the box tensors and the
output tile. The inner math is the same sort-free Green's-theorem clip as
ops.iou, but fully unrolled over the 4x4 edge/half-plane combinations so
every array the VPU touches is a 2-D (TILE_N, TILE_M) tile (Mosaic lowers
those best; >2-D indexing hits unsupported gathers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128
TILE_M = 128


def _corner_lists(x, y, w, h, a):
    """Column vectors -> lists of 4 corner coordinate arrays (CCW)."""
    cos_a, sin_a = jnp.cos(a), jnp.sin(a)
    wx, wy = w * 0.5 * cos_a, w * 0.5 * sin_a
    hx, hy = -h * 0.5 * sin_a, h * 0.5 * cos_a
    xs = [x - wx - hx, x + wx - hx, x + wx + hx, x - wx + hx]
    ys = [y - wy - hy, y + wy - hy, y + wy + hy, y - wy + hy]
    return xs, ys


def _iou_tile_kernel(a_ref, b_ref, out_ref, *, mode: str):
    """One (TILE_N, TILE_M) tile; a_ref (TILE_N, 5), b_ref (TILE_M, 5)."""
    a = a_ref[:]
    b = b_ref[:]
    # centering + operand shrink happen in the wrapper (Mosaic can't reduce
    # strided columns); the kernel is pure pairwise math.
    axs, ays = _corner_lists(a[:, 0], a[:, 1], a[:, 2], a[:, 3], a[:, 4])
    bxs, bys = _corner_lists(b[:, 0], b[:, 1], b[:, 2], b[:, 3], b[:, 4])
    ax = [v[:, None] for v in axs]       # (TN, 1)
    ay = [v[:, None] for v in ays]
    bx = [v[None, :] for v in bxs]       # (1, TM)
    by = [v[None, :] for v in bys]

    big = 1e9
    # per-pair local origin (box A's center): the closed boundary integral
    # is origin-independent, and local coordinates keep the decisive cross
    # terms ~1e2 smaller than fp32 noise at image-scale coordinates.
    ocx = a[:, 0][:, None]
    ocy = a[:, 1][:, None]

    def clip_edges(px, py, qx, qy):
        """Sum of cross(p(t0), p(t1)) over 4 edges of P clipped against the
        4 half-planes of Q. px/py: list of 4 (TN,1) [or (1,TM)];
        qx/qy: the other orientation. Result broadcasts to (TN, TM)."""
        total = 0.
        for i in range(4):
            sx, sy = px[i], py[i]
            dx = px[(i + 1) % 4] - sx
            dy = py[(i + 1) % 4] - sy
            t0 = 0.
            t1 = 1.
            for k in range(4):
                vx, vy = qx[k], qy[k]
                ex = qx[(k + 1) % 4] - vx
                ey = qy[(k + 1) % 4] - vy
                num = ex * (sy - vy) - ey * (sx - vx)
                den = ex * dy - ey * dx
                safe = jnp.where(jnp.abs(den) > 1e-12, den, 1e-12)
                t_at = -num / safe
                lower = jnp.where(den > 1e-12, t_at, -big)
                lower = jnp.where((jnp.abs(den) <= 1e-12) & (num < 0), big,
                                  lower)
                upper = jnp.where(den < -1e-12, t_at, big)
                t0 = jnp.maximum(t0, lower)
                t1 = jnp.minimum(t1, upper)
            p0x = sx + t0 * dx - ocx
            p0y = sy + t0 * dy - ocy
            p1x = sx + t1 * dx - ocx
            p1y = sy + t1 * dy - ocy
            total = total + jnp.where(t1 > t0, p0x * p1y - p0y * p1x, 0.0)
        return total

    area2 = clip_edges(ax, ay, bx, by) + clip_edges(bx, by, ax, ay)
    inter = jnp.maximum(0.5 * area2, 0.0)

    area_a = (a[:, 2] * a[:, 3])[:, None]
    area_b = (b[:, 2] * b[:, 3])[None, :]
    # physical bound: grazing-parallel edges can numerically over-count
    inter = jnp.minimum(inter, jnp.minimum(area_a, area_b))
    if mode == 'iou':
        denom = area_a + area_b - inter
    else:
        denom = jnp.broadcast_to(area_a, inter.shape)
    out_ref[:] = inter / jnp.maximum(denom, 1e-6)


def box_iou_rotated_pallas(boxes1, boxes2, mode: str = 'iou'):
    """Pairwise rotated IoU (N, 5) x (M, 5) -> (N, M), tiled TPU kernel.

    Inputs are padded to tile multiples (padded rows are zero boxes with
    IoU 0 against everything).
    """
    n, m = boxes1.shape[0], boxes2.shape[0]
    n_pad = -(-n // TILE_N) * TILE_N
    m_pad = -(-m // TILE_M) * TILE_M
    boxes1 = boxes1.astype(jnp.float32)
    boxes2 = boxes2.astype(jnp.float32)
    # fp32 conditioning: center both sets on their joint mean; shrink the
    # second operand to break coincident boundaries. The shrink is larger
    # than ops.iou's (1e-4 vs 1e-6): the kernel evaluates pairs in a global
    # frame, so the half-plane signal must dominate ~1e-7-relative fp32
    # cross-product noise (IoU bias ~2e-4, below test tolerance).
    ctr = 0.5 * (boxes1[:, :2].mean(0) + boxes2[:, :2].mean(0))
    offset = jnp.concatenate([ctr, jnp.zeros((3,), jnp.float32)])
    shrink = jnp.asarray([1., 1., 1. - 1e-4, 1. - 1e-4, 1.], jnp.float32)
    b1 = jnp.pad(boxes1 - offset, ((0, n_pad - n), (0, 0)))
    b2 = jnp.pad((boxes2 - offset) * shrink, ((0, m_pad - m), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_iou_tile_kernel, mode=mode),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        grid=(n_pad // TILE_N, m_pad // TILE_M),
        in_specs=[
            pl.BlockSpec((TILE_N, 5), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, 5), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, TILE_M), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=300 * TILE_N * TILE_M,
            bytes_accessed=(TILE_N + TILE_M) * 20 + TILE_N * TILE_M * 4,
            transcendentals=4 * (TILE_N + TILE_M)),
    )(b1, b2)
    return out[:n, :m]


def box_iou_rotated_pallas_interpret(boxes1, boxes2, mode: str = 'iou'):
    """Interpreter-mode entry (runs on any backend; used by tests and as a
    fallback where Mosaic compilation is unavailable — the axon remote
    compile service in this image hangs on Mosaic kernels, so the jnp path
    (ops.iou) remains the production default until that's resolved)."""
    n, m = boxes1.shape[0], boxes2.shape[0]
    n_pad = -(-n // TILE_N) * TILE_N
    m_pad = -(-m // TILE_M) * TILE_M
    boxes1 = boxes1.astype(jnp.float32)
    boxes2 = boxes2.astype(jnp.float32)
    ctr = 0.5 * (boxes1[:, :2].mean(0) + boxes2[:, :2].mean(0))
    offset = jnp.concatenate([ctr, jnp.zeros((3,), jnp.float32)])
    shrink = jnp.asarray([1., 1., 1. - 1e-4, 1. - 1e-4, 1.], jnp.float32)
    b1 = jnp.pad(boxes1 - offset, ((0, n_pad - n), (0, 0)))
    b2 = jnp.pad((boxes2 - offset) * shrink, ((0, m_pad - m), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_iou_tile_kernel, mode=mode),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        grid=(n_pad // TILE_N, m_pad // TILE_M),
        in_specs=[
            pl.BlockSpec((TILE_N, 5), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, 5), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, TILE_M), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=True,
    )(b1, b2)
    return out[:n, :m]
