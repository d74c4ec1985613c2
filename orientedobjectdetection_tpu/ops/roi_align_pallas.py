"""Pallas TPU kernel for RoIAlignRotated over an FPN pyramid.

Replaces the XLA-gather formulation of :mod:`.roi_align_rotated` on the
inference hot path (reference CUDA analog:
``mmcv.ops.RoIAlignRotated`` routed per level by
``roi_extractors/rotate_single_level_roi_extractor.py:14-167``).

Why a kernel: profiled on v5e, the gather formulation is 78% of Oriented
R-CNN e2e inference (125 ms of 160 ms at batch 4, R=2000) — XLA lowers the
(B, R*P) row gather to ~34 GB/s effective HBM bandwidth. This kernel
instead:

- DMAs, per roi, ONE contiguous-row window (WIN x WIN x C) of the roi's
  FPN level from HBM into VMEM (the 196 rotated-grid sample points of a
  7x7 bin grid with sampling_ratio 2 always fit: the level router caps a
  roi's feature extent at 28*sqrt(2) cells except top-level-clamped giants,
  whose extent at stride 32 is <= image_diag/32 <= 45.3; +3 bilinear cells
  = 48 -> WIN = 48);
- evaluates ALL samples of a roi as two small dense contractions on the
  window: bilinear interpolation is separable, ``out[p, c] =
  sum_y A[p, y] sum_x B[p, x] * win[y, x, c]`` where A/B each carry the
  two nonzero bilinear row/col weights per sample point (with the
  out-of-bounds corner masks folded in — identical masking semantics to
  the gather path). The y-contraction is an MXU matmul (196 x 48 @
  48 x 48C), the x-contraction a VPU reduce. The (196, 48, C) intermediate
  lives only in VMEM — never touches HBM.
- double-buffers the window DMAs across roi blocks (grid is sequential:
  ``dimension_semantics='arbitrary'``), so HBM reads overlap the MXU work.

A/B matrices and per-roi window origins are precomputed with jnp (cheap,
fused); the kernel is inference-only (no VJP) — training uses the
differentiable gather path on its much smaller sampled roi set (512).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 48           # window cells per side (see module docstring)
RBLK = 2           # rois per grid step (VMEM-bound: 2 double-buffered wins)
P14 = 14           # sample grid side (7 bins x sampling_ratio 2)
P = P14 * P14


def _level_of_rois(rois, num_levels: int, finest_scale: float = 56.0):
    scale = jnp.sqrt(jnp.maximum(rois[..., 2] * rois[..., 3], 1e-12))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)


def _sample_coords(rois, roi_scale, clockwise: bool):
    """Rotated-grid sample coordinates in feature cells (B, R, P) x2.

    Identical sampling convention to the gather path
    (``roi_align_rotated.py``): (k + 0.5)/(7*s) bin placement,
    aligned=True -0.5 offset.
    """
    g = (jnp.arange(P14) + 0.5) / P14 - 0.5                    # (14,)
    gxx, gyy = jnp.meshgrid(g, g)                              # (14, 14)
    grid = jnp.stack([gxx.ravel(), gyy.ravel()], -1)           # (P, 2)

    cx, cy, w, h, a = [rois[..., i] for i in range(5)]
    if clockwise:
        a = -a
    cos_a, sin_a = jnp.cos(a), jnp.sin(a)
    lx = grid[None, None, :, 0] * w[..., None]
    ly = grid[None, None, :, 1] * h[..., None]
    px = cx[..., None] + lx * cos_a[..., None] - ly * sin_a[..., None]
    py = cy[..., None] + lx * sin_a[..., None] + ly * cos_a[..., None]
    fx = px * roi_scale[..., None] - 0.5
    fy = py * roi_scale[..., None] - 0.5
    return fx, fy


def _axis_weights(f, origin, size):
    """(…, P) coords -> (…, P, WIN) one-hot-pair bilinear weight matrix.

    Folds the per-corner in-bounds mask (coordinate in [0, size)) exactly
    like the gather path's ``inb`` check; window-local indices outside
    [0, WIN) produce all-zero rows automatically.
    """
    i0 = jnp.floor(f)
    w1 = f - i0
    w0 = 1.0 - w1
    i0 = i0.astype(jnp.int32)
    v0 = (i0 >= 0) & (i0 < size[..., None])
    v1 = (i0 + 1 >= 0) & (i0 + 1 < size[..., None])
    loc0 = i0 - origin[..., None]
    iota = jnp.arange(WIN, dtype=jnp.int32)
    m0 = (loc0[..., None] == iota) & v0[..., None]
    m1 = ((loc0 + 1)[..., None] == iota) & v1[..., None]
    return (w0[..., None] * m0 + w1[..., None] * m1)


def _kernel(lvl_ref, row_ref, col_ref,        # scalar prefetch (B, R) SMEM
            a_ref, b_ref,                     # (1, RBLK, P, WIN) VMEM bf16
            *refs):
    feat_refs = refs[:-3]                     # per-level (B, H, W, C) ANY
    out_ref, win_scr, sems = refs[-3:]
    b = pl.program_id(0)
    rb = pl.program_id(1)
    nrb = pl.num_programs(1)
    nb = pl.num_programs(0)

    def start_block(slot, b_, rb_):
        for i in range(RBLK):
            r = rb_ * RBLK + i
            lvl = lvl_ref[b_, r]
            r0 = row_ref[b_, r]
            c0 = col_ref[b_, r]
            for li, f in enumerate(feat_refs):
                @pl.when(lvl == li)
                def _():
                    pltpu.make_async_copy(
                        f.at[b_, pl.ds(r0, WIN), pl.ds(c0, WIN), :],
                        win_scr.at[slot, i],
                        sems.at[slot, i]).start()

    def wait_one(slot, i, b_, rb_):
        r = rb_ * RBLK + i
        lvl = lvl_ref[b_, r]
        r0 = row_ref[b_, r]
        c0 = col_ref[b_, r]
        for li, f in enumerate(feat_refs):
            @pl.when(lvl == li)
            def _():
                pltpu.make_async_copy(
                    f.at[b_, pl.ds(r0, WIN), pl.ds(c0, WIN), :],
                    win_scr.at[slot, i],
                    sems.at[slot, i]).wait()

    step = b * nrb + rb
    cur = jax.lax.rem(step, 2)
    nxt = jax.lax.rem(step + 1, 2)

    @pl.when(step == 0)
    def _():
        start_block(cur, b, rb)

    # prefetch the next block's windows (possibly the next batch row's
    # first block) while this block computes
    nxt_b = (step + 1) // nrb
    nxt_rb = jax.lax.rem(step + 1, nrb)

    @pl.when(step + 1 < nb * nrb)
    def _():
        start_block(nxt, nxt_b, nxt_rb)

    c = win_scr.shape[-1]
    cchunk = 64
    for i in range(RBLK):
        wait_one(cur, i, b, rb)
        win = win_scr[cur, i]                       # (WIN, WIN, C) bf16
        a_m = a_ref[0, i]                           # (P, WIN) bf16
        b_m = b_ref[0, i]                           # (P, WIN) bf16
        outs = []
        for c0 in range(0, c, cchunk):
            w2d = win[:, :, c0:c0 + cchunk].reshape(WIN, WIN * cchunk)
            t = jax.lax.dot_general(
                a_m, w2d, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (P, WIN*cc)
            t = t.reshape(P, WIN, cchunk)
            s = jnp.sum(t * b_m[:, :, None].astype(jnp.float32), axis=1)
            outs.append(s)                           # (P, cc)
        s_all = jnp.concatenate(outs, axis=-1)       # (P, C) f32
        # bin-average the sampling_ratio^2 samples per bin
        pooled = s_all.reshape(7, 2, 7, 2, c).mean(axis=(1, 3))
        out_ref[0, i] = pooled.reshape(49, c).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('out_size', 'spatial_scales',
                                             'sampling_ratio',
                                             'finest_scale', 'clockwise'))
def roi_align_rotated_pallas(feats: Sequence[jnp.ndarray],
                             rois: jnp.ndarray,
                             out_size: Tuple[int, int] = (7, 7),
                             spatial_scales: Sequence[float] = (
                                 1 / 4, 1 / 8, 1 / 16, 1 / 32),
                             sampling_ratio: int = 2,
                             finest_scale: float = 56.0,
                             clockwise: bool = False) -> jnp.ndarray:
    """Drop-in for :func:`.roi_align_rotated.roi_align_rotated` (7x7, s=2).

    feats: per-level (B, H_l, W_l, C); rois: (B, R, 5) [cx,cy,w,h,theta].
    Returns (B, R, 7, 7, C) in the feats' dtype.
    """
    assert tuple(out_size) == (7, 7) and sampling_ratio == 2, \
        'pallas kernel is specialized to the zoo-wide 7x7 s=2 shape'
    num_levels = len(feats)
    b, _, _, c = feats[0].shape
    r = rois.shape[1]
    # pad R to a multiple of RBLK with degenerate rois
    pad_r = (-r) % RBLK
    if pad_r:
        rois = jnp.concatenate(
            [rois, jnp.zeros((b, pad_r, 5), rois.dtype)], axis=1)
    rp = rois.shape[1]

    # pad every level to at least WIN cells per side so window DMAs are
    # always in-bounds (tiny top levels of small inputs)
    feats = [jnp.pad(f, ((0, 0), (0, max(0, WIN - f.shape[1])),
                         (0, max(0, WIN - f.shape[2])), (0, 0)))
             if (f.shape[1] < WIN or f.shape[2] < WIN) else f
             for f in feats]

    # padded extents: the in-bounds masks may admit pad cells — they are
    # zero-valued, so their contribution matches mmcv's zeroed
    # out-of-bounds corners exactly
    heights = jnp.asarray([f.shape[1] for f in feats], jnp.int32)
    widths = jnp.asarray([f.shape[2] for f in feats], jnp.int32)

    lvl = _level_of_rois(rois, num_levels, finest_scale)       # (B, R)
    scales = jnp.asarray(spatial_scales, jnp.float32)
    roi_scale = scales[lvl]
    fh = heights[lvl]                                          # (B, R)
    fw = widths[lvl]

    fx, fy = _sample_coords(rois, roi_scale, clockwise)        # (B, R, P)

    col0 = jnp.clip(jnp.floor(fx.min(-1)).astype(jnp.int32) - 1,
                    0, fw - WIN)
    row0 = jnp.clip(jnp.floor(fy.min(-1)).astype(jnp.int32) - 1,
                    0, fh - WIN)

    a_mat = _axis_weights(fy, row0, fh)                        # (B,R,P,WIN)
    b_mat = _axis_weights(fx, col0, fw)
    # fold the degenerate/padding-roi mask into A (zero rows -> zero out)
    valid = (rois[..., 2] > 1e-3) & (rois[..., 3] > 1e-3)
    a_mat = (a_mat * valid[..., None, None]).astype(jnp.bfloat16)
    b_mat = b_mat.astype(jnp.bfloat16)

    nrb = rp // RBLK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, nrb),
        in_specs=([pl.BlockSpec((1, RBLK, P, WIN),
                                lambda bi, ri, *_: (bi, ri, 0, 0)),
                   pl.BlockSpec((1, RBLK, P, WIN),
                                lambda bi, ri, *_: (bi, ri, 0, 0))]
                  + [pl.BlockSpec(memory_space=pltpu.ANY)] * num_levels),
        out_specs=pl.BlockSpec((1, RBLK, 49, c),
                               lambda bi, ri, *_: (bi, ri, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, RBLK, WIN, WIN, c), feats[0].dtype),
            pltpu.SemaphoreType.DMA((2, RBLK)),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, rp, 49, c), feats[0].dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
    )(lvl, row0, col0, a_mat, b_mat, *feats)
    out = out.reshape(b, rp, 7, 7, c)
    if pad_r:
        out = out[:, :r]
    return out
