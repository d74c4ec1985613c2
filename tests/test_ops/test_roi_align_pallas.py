"""Parity of the Pallas RoIAlignRotated kernel vs the gather reference.

Runs the kernel in interpret mode so the check works on CPU (the Mosaic
path is exercised on real hardware by bench.py / the Oriented R-CNN e2e
inference). Covers: level routing, rotated sampling, degenerate/padding
rois, giant top-level-clamped rois, and ELONGATED rois that overflow the
window and take the exact gather fallback (the round-5 bug: a 288x30
level-0 roi spans 67 cells > the 48-cell window).
"""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture()
def interpret_pallas(monkeypatch):
    from jax.experimental import pallas as pl

    import orientedobjectdetection_tpu.ops.roi_align_pallas as rap

    real = pl.pallas_call

    def patched(*a, **k):
        k['interpret'] = True
        return real(*a, **k)

    monkeypatch.setattr(rap.pl, 'pallas_call', patched)
    return rap


def _rand_case(rng, B=2, R=16, C=64, elongated=False):
    feats = tuple(jnp.asarray(
        rng.normal(size=(B, s, s, C)).astype(np.float32))
        for s in (64, 32, 16, 8))
    rois = np.zeros((B, R, 5), np.float32)
    rois[..., 0] = rng.uniform(20, 230, (B, R))
    rois[..., 1] = rng.uniform(20, 230, (B, R))
    if elongated:
        rois[..., 2] = rng.uniform(8, 220, (B, R))
        rois[..., 3] = rng.uniform(4, 40, (B, R))
    else:
        rois[..., 2] = rng.uniform(8, 180, (B, R))
        rois[..., 3] = rng.uniform(8, 180, (B, R))
    rois[..., 4] = rng.uniform(-1.5, 1.5, (B, R))
    rois[0, 3, 2:4] = 0.0                       # padding roi
    rois[0, 4] = [128, 128, 350, 350, 0.7]      # giant (top-level clamp)
    return feats, jnp.asarray(rois)


@pytest.mark.parametrize('elongated', [False, True])
def test_parity_vs_gather(interpret_pallas, elongated):
    from orientedobjectdetection_tpu.ops.roi_align_rotated import (
        roi_align_rotated)

    rng = np.random.default_rng(3 if elongated else 0)
    feats, rois = _rand_case(rng, elongated=elongated)
    scales = (1 / 4, 1 / 8, 1 / 16, 1 / 32)
    ref = np.asarray(roi_align_rotated(feats, rois, (7, 7), scales, 2,
                                       56.0))
    out = np.asarray(interpret_pallas.roi_align_rotated_pallas(
        feats, rois, (7, 7), scales, 2, 56.0, oversize_cap=8))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 2e-2, rel          # bf16 A/B rounding only


def test_padding_roi_outputs_zero(interpret_pallas):
    rng = np.random.default_rng(1)
    feats, rois = _rand_case(rng)
    out = np.asarray(interpret_pallas.roi_align_rotated_pallas(
        feats, rois, (7, 7), (1 / 4, 1 / 8, 1 / 16, 1 / 32), 2, 56.0,
        oversize_cap=8))
    assert np.abs(out[0, 3]).max() == 0.0
