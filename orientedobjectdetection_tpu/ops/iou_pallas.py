"""Pallas TPU kernel: tiled pairwise rotated IoU.

Compiled replacement for the CUDA ``box_iou_rotated`` the reference inherits
from mmcv (``core/bbox/iou_calculators/rotate_iou2d_calculator.py:2``) on the
NMS/assignment hot path. The jnp implementation (:mod:`ops.iou`)
materializes per-pair intermediates in HBM between fusion boundaries; this
kernel keeps everything for a (TILE_N x TILE_M) tile in VMEM, streaming only
the box tensors and the output tile.

Mosaic layout note (the round-2 blocker): building the M-oriented corner
rows by transposing a column inside the kernel (``(M,1) -> (1,M)`` reshape)
makes the Mosaic compiler hang indefinitely on this image. The fix is to
feed the second operand PRE-TRANSPOSED as ``(5, M)`` so its component reads
are already lane-oriented ``(1, TILE_M)`` rows; every array the VPU touches
is then a natural 2-D broadcast of (TILE_N, 1) x (1, TILE_M) with no
in-kernel relayout, and the full two-pass clip kernel compiles in ~1.5 s.

The inner math is the same sort-free Green's-theorem clip as ops.iou,
fully unrolled over the 4x4 edge/half-plane combinations, restructured
around the rectangle's degeneracies (see :func:`_clip_pass`): a rectangle
has only TWO distinct edge directions, so the 16 per-pair Liang-Barsky
denominators collapse to 4 shared cross products (4 reciprocals instead of
16), every numerator is a +-1 combination of 6 shared cross terms, and the
per-segment boundary integral cross(p(t0), p(t1)) factors exactly as
(t1 - t0) * cross(s, d). ~2x fewer VPU ops per pair than the direct
unrolled clip (measured on v5e: 0.65 -> 0.33 ms for the 2048-candidate NMS
pair mask).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128
TILE_M = 128


def _vectors_col(v):
    """(TN, 5) box columns -> center + half-extent vectors, (TN, 1) each."""
    x, y, w, h, a = (v[:, 0:1], v[:, 1:2], v[:, 2:3], v[:, 3:4], v[:, 4:5])
    ca, sa = jnp.cos(a), jnp.sin(a)
    return (x, y, w * 0.5 * ca, w * 0.5 * sa, -h * 0.5 * sa, h * 0.5 * ca)


def _vectors_row(vT):
    """(5, TM) transposed boxes -> center + half-extent vectors, (1, TM)."""
    x, y, w, h, a = (vT[0:1, :], vT[1:2, :], vT[2:3, :], vT[3:4, :],
                     vT[4:5, :])
    ca, sa = jnp.cos(a), jnp.sin(a)
    return (x, y, w * 0.5 * ca, w * 0.5 * sa, -h * 0.5 * sa, h * 0.5 * ca)


# CCW corner i of a box = c + _AB[i][0] * w_vec + _AB[i][1] * h_vec;
# edge i (corner i -> i+1) = _SIG[i] * 2 * {w_vec if _TYP[i] == 0 else h_vec}
_AB = ((-1., -1.), (1., -1.), (1., 1.), (-1., 1.))
_SIG = (1., 1., -1., -1.)
_TYP = (0, 1, 0, 1)


def _cross(ax, ay, bx, by):
    return ax * by - ay * bx


def _edge_dirs(boxv, approx: bool):
    """Shared (TN, TM) denominator terms for one clip ORIENTATION.

    A rectangle pair has only 4 distinct Liang-Barsky denominators — the
    cross products of Q's two edge directions with P's two: the 16 per-pair
    (edge, half-plane) denominators are sign flips of these. Returns, for
    each (clipper_type, clippee_type) in [ww, wh, hw, hh] order:
    ``g`` = 4 * cross(uQ, uP) (the exact denominator magnitude the direct
    kernel computes), its clamped reciprocal, and the three sign masks.
    The reverse orientation reuses everything via cross(a, b) = -cross(b, a)
    (see :func:`_flip_dirs`) — so one reciprocal per distinct direction
    pair, 4 total, instead of 16 per pass."""
    (_, _, pwx, pwy, phx, phy), (_, _, qwx, qwy, qhx, qhy) = boxv
    out = []
    for qx_, qy_ in ((qwx, qwy), (qhx, qhy)):
        for px_, py_ in ((pwx, pwy), (phx, phy)):
            g = 4.0 * _cross(qx_, qy_, px_, py_)
            safe = jnp.where(jnp.abs(g) > 1e-12, g, 1e-12)
            if approx:
                r = pl.reciprocal(safe, approx=True)
            else:
                r = 1.0 / safe
            gpos = g > 1e-12
            gneg = g < -1e-12
            out.append((r, gpos, gneg, jnp.logical_not(gpos | gneg)))
    return out


def _flip_dirs(dirs):
    """Denominator bundle for the swapped orientation: transpose the
    (clipper_type, clippee_type) table and negate (g -> -g flips the sign
    masks; the reciprocal's parallel-clamp branch differs but is only read
    where both sign masks are False, i.e. never)."""
    ww, wh, hw, hh = dirs
    return [(-r, gneg, gpos, gpar)
            for (r, gpos, gneg, gpar) in (ww, hw, wh, hh)]


def _clip_pass(pv, qv, dirs):
    """Sum of cross(p(t0), p(t1)) over the 4 edges of rectangle P clipped
    against the 4 half-planes of rectangle Q (Liang-Barsky).

    ``pv``/``qv`` are (cx, cy, wx, wy, hx, hy) vector bundles of the
    clippee/clipper ((TN, 1) one side, (1, TM) the other); ``dirs`` the
    shared denominator bundle from :func:`_edge_dirs` in THIS pass's
    orientation. Exploits the rectangle structure three ways:
    - every numerator cross(e_k, s_i - v_k) is a +-combination of 6 shared
      cross terms (cross of Q's two edge dirs with P's center/w/h) plus a
      per-clipper constant, so each costs ~3 adds instead of a fresh
      6-op cross;
    - denominators/reciprocals come precomputed from ``dirs``;
    - the surviving-segment boundary integral cross(p(t0), p(t1)) factors
      exactly as (t1 - t0) * cross(s_i, d_i), with cross(s_i, d_i) a cheap
      per-clippee (not per-pair) quantity.
    Degenerate-parallel semantics match the direct kernel: pairs with
    |den| <= 1e-12 contribute t-bounds of +-inf/rejection identically."""
    big = 1e9
    pcx, pcy, pwx, pwy, phx, phy = pv
    qcx, qcy, qwx, qwy, qhx, qhy = qv

    # pairwise shared numerators: cross(uQ_t, cP) and cross(uQ_t, uP_t)
    xw = _cross(qwx, qwy, pcx, pcy)            # (TN, TM) outer
    xh = _cross(qhx, qhy, pcx, pcy)
    gww = _cross(qwx, qwy, pwx, pwy)
    gwh = _cross(qwx, qwy, phx, phy)
    ghw = _cross(qhx, qhy, pwx, pwy)
    ghh = _cross(qhx, qhy, phx, phy)

    # per-clipper constants V_k = cross(uQ_tk, v_k) (1-D along clipper)
    xwq = _cross(qwx, qwy, qcx, qcy)
    xhq = _cross(qhx, qhy, qcx, qcy)
    eq = _cross(qwx, qwy, qhx, qhy)            # cross(wQ, hQ)
    vk = []
    for k in range(4):
        a_k, b_k = _AB[k]
        if _TYP[k] == 0:                       # w-type edge: a*0 + b*eq
            vk.append(xwq + b_k * eq)
        else:                                  # h-type edge: a*(-eq) + b*0
            vk.append(xhq - a_k * eq)

    # per-clippee csd_i = cross(s_i, d_i) = sig_i * 2 * cross(s_i, uP_ti)
    cw = _cross(pcx, pcy, pwx, pwy)            # cross(cP, wP), 1-D
    ch = _cross(pcx, pcy, phx, phy)
    ep = _cross(pwx, pwy, phx, phy)            # cross(wP, hP)

    total = 0.
    for i in range(4):
        a_i, b_i = _AB[i]
        sig_i = _SIG[i]
        # cross(uQ_t, s_i) = x_t + a_i*g_tw + b_i*g_th, per clipper type t
        base_w = xw + a_i * gww + b_i * gwh
        base_h = xh + a_i * ghw + b_i * ghh
        if _TYP[i] == 0:                       # d_i ~ wP
            csd = sig_i * 2.0 * (cw + b_i * (-ep))
        else:                                  # d_i ~ hP
            csd = sig_i * 2.0 * (ch + a_i * ep)
        t0 = 0.
        t1 = 1.
        for k in range(4):
            sig_k = _SIG[k]
            base = base_w if _TYP[k] == 0 else base_h
            r, gpos, gneg, gpar = dirs[2 * _TYP[k] + _TYP[i]]
            # den = sig_i*sig_k*g with g = 4*cross(uQ, uP) and r = 1/g, so
            # t_at = -num/den = sig_i*(V_k - base)/(2*cross) = 2*diff*r;
            # sig_i folds into the subtraction order
            diff = (vk[k] - base) if sig_i > 0 else (base - vk[k])
            t_at = 2.0 * diff * r
            # den = sig_i*sig_k*g ; num = 2*sig_k*(base - V_k)
            pos = gpos if sig_i * sig_k > 0 else gneg
            neg = gneg if sig_i * sig_k > 0 else gpos
            numneg = (base < vk[k]) if sig_k > 0 else (base > vk[k])
            lower = jnp.where(pos, t_at, -big)
            lower = jnp.where(gpar & numneg, big, lower)
            upper = jnp.where(neg, t_at, big)
            t0 = jnp.maximum(t0, lower)
            t1 = jnp.minimum(t1, upper)
        total = total + jnp.maximum(t1 - t0, 0.0) * csd
    return total


def _iou_tile_kernel(live_ref, a_ref, bT_ref, o_ref, *, mode: str):
    """One (TILE_N, TILE_M) tile; a_ref (TILE_N, 5), bT_ref (5, TILE_M).

    Inputs arrive pre-conditioned by the wrapper (centered on the joint box
    mean with the second operand shrunk), so the kernel is pure pairwise
    math. Coordinates are already near the origin, so no per-pair local
    frame is needed; the decisive half-plane cross terms stay well above
    fp32 noise for DOTA-scale (<=2e4 px) inputs.

    ``live_ref`` (SMEM, (nb_r, nb_c) int32) is the wrapper's conservative
    reachability bitmap: tiles whose row/col bounding rects (centers
    inflated by each box's circumradius bound) cannot intersect have IoU
    identically 0 and skip the clip math. Assignment matrices (grid-ordered
    anchors x few gt) skip most of the grid this way; measured 14 ms ->
    ~3 ms on the batch-8 R50 train-step assignment.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    live = live_ref[i, j] != 0

    @pl.when(jnp.logical_not(live))
    def _zero():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(live)
    def _compute():
        o_ref[:] = _tile_iou(a_ref[:], bT_ref[:], mode)


def _tile_inter(a, bT, approx: bool = False):
    """(TN, 5) x (5, TM) -> (inter, area_a, area_b) for one tile.

    Green's theorem over the clipped boundary of the intersection polygon:
    pass 1 integrates P's edges clipped to Q's half-planes, pass 2 the
    converse; the sum is twice the signed intersection area. The 4 shared
    Liang-Barsky denominators (and their reciprocals) are computed once by
    :func:`_edge_dirs` and reused by both passes via :func:`_flip_dirs`
    (cross(a, b) = -cross(b, a))."""
    pv = _vectors_col(a)
    qv = _vectors_row(bT)
    dirs = _edge_dirs((pv, qv), approx)
    area2 = (_clip_pass(pv, qv, dirs) +
             _clip_pass(qv, pv, _flip_dirs(dirs)))
    inter = jnp.maximum(0.5 * area2, 0.0)

    area_a = a[:, 2:3] * a[:, 3:4]            # (TN, 1)
    area_b = bT[2:3, :] * bT[3:4, :]          # (1, TM)
    # physical bound: grazing-parallel edges can numerically over-count
    inter = jnp.minimum(inter, jnp.minimum(area_a, area_b))
    return inter, area_a, area_b


def _tile_iou(a, bT, mode: str):
    """(TN, 5) x (5, TM) -> (TN, TM) IoU/IoF tile (shared kernel body)."""
    inter, area_a, area_b = _tile_inter(a, bT)
    if mode == 'iou':
        denom = area_a + area_b - inter
    else:
        denom = area_a + jnp.zeros_like(inter)
    return inter / jnp.maximum(denom, 1e-6)


def _pair_mask_kernel(rmax_ref, cmin_ref, rcls_ref, ccls_ref, a_ref, bT_ref,
                      o_ref, *, thr: float, tn: int, tm: int,
                      approx: bool = True):
    """Strict-upper-triangle thresholded pair mask for NMS: tile (i, j)
    computes (iou > thr) & (col > row) & (same class); tiles strictly below
    the diagonal skip the clip math entirely (the pair mask is symmetric
    work the full-matrix kernel would waste — ~2x fewer clip evaluations).

    Class handling is two-level and matches the jnp fallback
    (``ops.nms._upper_pair_mask``) exactly:
    - per-pair: ``rcls_ref``/``ccls_ref`` carry the row/column class ids
      ((tn, 1) and (1, tm) VMEM vectors); cross-class pairs are masked out
      of live tiles, so suppression is intra-class by construction — not
      merely by the caller's class-offset layout.
    - per-tile skip: when boxes are CLASS-MAJOR sorted, a tile whose row
      classes all precede its column classes has no same-class pair, so the
      clip math is skipped. ``rmax_ref``/``cmin_ref`` are the FULL per-tile
      max-row-class / min-col-class vectors in SMEM (Mosaic requires
      sub-8x128 blocks to be whole arrays), indexed by program id; callers
      without class structure pass constants that never skip.
    With DOTA's 15 classes this prunes the 2000-candidate NMS from ~136
    active tiles to ~30."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    live = (j * tm + tm > i * tn) & (rmax_ref[i, 0] >= cmin_ref[j, 0])

    @pl.when(jnp.logical_not(live))
    def _zero():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(live)
    def _compute():
        # Division-free: iou > thr  <=>  inter > thr * (union), union > 0
        # always (wh are clamped upstream). The 16 clip divides run on the
        # fast approximate reciprocal — the mask only needs the threshold
        # comparison, so ~1e-6-relative t error is immaterial (measured: 2
        # flips in 2.1M random pairs, both within 1e-4 of the threshold).
        # Interpret mode keeps exact division: the CPU emulation of the
        # approx reciprocal is far coarser than the TPU unit.
        inter, area_a, area_b = _tile_inter(a_ref[:], bT_ref[:],
                                            approx=approx)
        denom = area_a + area_b - inter
        row = i * tn + jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 0)
        col = j * tm + jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 1)
        same = rcls_ref[:] == ccls_ref[:]        # (tn, 1) == (1, tm)
        # i1 -> i32 -> i8: a direct i1 select into the (32, 128)-tiled i8
        # output is an unsupported Mosaic relayout; widening to i32 first
        # keeps the mask in its native (8, 128) tiling and the i32 -> i8
        # truncation is a supported pack.
        m = ((inter > thr * denom) & (col > row) & same).astype(jnp.int32)
        o_ref[:] = m.astype(jnp.int8)


def _tile_rects(boxes, n_real, n_pad, tile):
    """Per-tile conservative bounding rects (xmin, xmax, ymin, ymax) of
    ``boxes`` (n_pad, 5) grouped in ``tile``-row tiles. Each box is
    inflated by (w + h) / 2 >= its circumradius; padded rows are ignored.
    Two boxes whose inflated rects don't intersect have IoU 0."""
    r = 0.5 * (boxes[:, 2] + boxes[:, 3])
    valid = jnp.arange(n_pad) < n_real
    big = jnp.float32(3e38)
    lo_x = jnp.where(valid, boxes[:, 0] - r, big).reshape(-1, tile)
    hi_x = jnp.where(valid, boxes[:, 0] + r, -big).reshape(-1, tile)
    lo_y = jnp.where(valid, boxes[:, 1] - r, big).reshape(-1, tile)
    hi_y = jnp.where(valid, boxes[:, 1] + r, -big).reshape(-1, tile)
    return (lo_x.min(1), hi_x.max(1), lo_y.min(1), hi_y.max(1))


def _live_tiles(b1, n, n_pad, tile_n, b2, m, m_pad, tile_m):
    """(nb_r, nb_c) int32 bitmap: 1 where the row tile's rect intersects
    the col tile's rect (conservative — 0 implies every pair IoU is 0)."""
    rx0, rx1, ry0, ry1 = _tile_rects(b1, n, n_pad, tile_n)
    cx0, cx1, cy0, cy1 = _tile_rects(b2, m, m_pad, tile_m)
    sep = (rx0[:, None] > cx1[None, :]) | (cx0[None, :] > rx1[:, None]) | \
          (ry0[:, None] > cy1[None, :]) | (cy0[None, :] > ry1[:, None])
    return jnp.logical_not(sep).astype(jnp.int32)


def _condition(boxes1, boxes2, n_pad, m_pad):
    """fp32 conditioning: center both sets on their joint mean; shrink the
    second operand to break coincident boundaries. The shrink is larger
    than ops.iou's (1e-4 vs 1e-6): the kernel evaluates pairs in a global
    frame, so the half-plane signal must dominate ~1e-7-relative fp32
    cross-product noise (IoU bias ~2e-4, below test tolerance)."""
    n, m = boxes1.shape[0], boxes2.shape[0]
    boxes1 = boxes1.astype(jnp.float32)
    boxes2 = boxes2.astype(jnp.float32)
    ctr = 0.5 * (boxes1[:, :2].mean(0) + boxes2[:, :2].mean(0))
    offset = jnp.concatenate([ctr, jnp.zeros((3,), jnp.float32)])
    shrink = jnp.asarray([1., 1., 1. - 1e-4, 1. - 1e-4, 1.], jnp.float32)
    b1 = jnp.pad(boxes1 - offset, ((0, n_pad - n), (0, 0)))
    b2T = jnp.pad((boxes2 - offset) * shrink,
                  ((0, m_pad - m), (0, 0))).T    # (5, m_pad)
    return b1, b2T


def box_iou_rotated_pallas(boxes1, boxes2, mode: str = 'iou',
                           interpret: bool = False):
    """Pairwise rotated IoU (N, 5) x (M, 5) -> (N, M), tiled TPU kernel.

    Inputs are padded to tile multiples (padded rows are zero boxes with
    IoU 0 against everything). ``interpret=True`` runs the same kernel via
    the Pallas interpreter (any backend; used by the CPU test suite).

    Tile shape adapts to the problem: assignment matrices are thin
    (G = 32..128 gt rows x ~200k anchor columns) and padding the row side
    to a square 128-tile wastes up to 4x the clip math (measured 56 ms ->
    14 ms on the batch-8 R50 train step's (32, 196480) assignment). Rows
    pad to the 8-sublane granule; columns widen to keep ~64k pairs per
    grid step so the sequential grid stays short.
    """
    n, m = boxes1.shape[0], boxes2.shape[0]
    tile_n = min(TILE_N, -(-n // 8) * 8)
    # keep tile area ~TILE_N*TILE_M (VMEM-bounded), but never above m
    tile_m = min(-(-m // 128) * 128, TILE_M * (TILE_N // tile_n))
    n_pad = -(-n // tile_n) * tile_n
    m_pad = -(-m // tile_m) * tile_m
    b1, b2T = _condition(boxes1, boxes2, n_pad, m_pad)
    live = _live_tiles(b1, n, n_pad, tile_n, b2T.T, m, m_pad, tile_m)

    out = pl.pallas_call(
        functools.partial(_iou_tile_kernel, mode=mode),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        grid=(n_pad // tile_n, m_pad // tile_m),
        in_specs=[
            pl.BlockSpec((n_pad // tile_n, m_pad // tile_m),
                         lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_n, 5), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, tile_m), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, tile_m), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=600 * tile_n * tile_m,
            bytes_accessed=(tile_n + tile_m) * 20 + tile_n * tile_m * 4,
            transcendentals=4 * (tile_n + tile_m)),
        interpret=interpret,
    )(live, b1, b2T)
    return out[:n, :m]


def box_iou_rotated_pallas_interpret(boxes1, boxes2, mode: str = 'iou'):
    """Interpreter-mode entry (runs on any backend; used by tests)."""
    return box_iou_rotated_pallas(boxes1, boxes2, mode=mode, interpret=True)


def nms_pair_mask_pallas(boxes, iou_thr: float, interpret: bool = False,
                         tile_n: int = TILE_N, tile_m: int = TILE_M,
                         class_ids=None):
    """(N, 5) score-sorted boxes -> (N, N) bool strict-upper-triangle
    suppression-candidate mask: mask[i, j] = (IoU(i, j) > thr) & (i < j).

    The NMS-specific fusion of the tile kernel: threshold + triangle fold
    into the kernel, and strictly-lower tiles skip the clip math — about
    half the pairwise work of the full-matrix kernel at N >> TILE. The mask
    is emitted as int8, not f32: at batch 8 x 2048^2 the mask is the
    dominant HBM tensor on the NMS path and every greedy-fixpoint round
    re-reads it, so 1-byte elements cut that traffic 4x.

    ``class_ids`` (optional, (N,) int32): suppression becomes intra-class —
    cross-class pairs are masked per pair inside the kernel, exactly like
    the jnp fallback. CLASS-MAJOR sorting additionally enables the per-tile
    class skip; the multiclass class-offset layout (reference
    ``bbox_nms_rotated.py:67-80``) makes the per-pair mask a no-op and the
    skip a pure perf win."""
    n = boxes.shape[0]
    pad_to = max(tile_n, tile_m)
    n_pad = -(-n // pad_to) * pad_to
    b1, b2T = _condition(boxes, boxes, n_pad, n_pad)

    nb_r, nb_c = n_pad // tile_n, n_pad // tile_m
    if class_ids is None:
        # constants: never skip a tile, every pair "same class"
        row_max = jnp.full((nb_r, 1), 1, jnp.int32)
        col_min = jnp.zeros((nb_c, 1), jnp.int32)
        cls = jnp.zeros((n_pad,), jnp.int32)
    else:
        cls = jnp.pad(class_ids.astype(jnp.int32), (0, n_pad - n),
                      constant_values=jnp.iinfo(jnp.int32).max // 2)
        row_max = cls.reshape(nb_r, tile_n).max(1, keepdims=True)
        col_min = cls.reshape(nb_c, tile_m).min(1, keepdims=True)
    cls_rows = cls.reshape(n_pad, 1)
    cls_cols = cls.reshape(1, n_pad)

    out = pl.pallas_call(
        functools.partial(_pair_mask_kernel, thr=float(iou_thr),
                          tn=tile_n, tm=tile_m, approx=not interpret),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), jnp.int8),
        grid=(nb_r, nb_c),
        in_specs=[
            pl.BlockSpec((nb_r, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nb_c, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_n, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 5), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, tile_m), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, tile_m), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=300 * tile_n * tile_m,
            bytes_accessed=(tile_n + tile_m) * 20 + tile_n * tile_m,
            transcendentals=4 * (tile_n + tile_m)),
        interpret=interpret,
    )(row_max, col_min, cls_rows, cls_cols, b1, b2T)
    return out[:n, :n].astype(bool)


def pallas_available() -> bool:
    """True when the default backend can compile Mosaic kernels (TPU)."""
    try:
        return jax.default_backend() == 'tpu'
    except Exception:
        return False
