"""Shape/finite tests for the round-3 yolo-block additions (reference
``models/blocks/yolo_blocks.py`` classes C3K2, C2PSA, MaxSigmoid*, BepC3,
LSKA, ASFF/DASFF/DCASFF, AFF_CSP, ImagePoolingAttention, ...)."""

import jax
import jax.numpy as jnp
import pytest

from orientedobjectdetection_tpu.models import yolo_blocks as yb

RNG = jax.random.PRNGKey(0)
X = jnp.ones((2, 16, 16, 32))


def _run(module, *args):
    variables = module.init(RNG, *args)
    out = jax.jit(module.apply)(variables, *args)
    for leaf in jax.tree.leaves(out):
        assert bool(jnp.isfinite(leaf).all())
    return out


@pytest.mark.parametrize('cls,kw', [
    (yb.BottleRep, dict(out_channels=32, adaptive_weight=True)),
    (yb.ConvWrapper, dict(out_channels=48)),
    (yb.BepC3StageBlock, dict(out_channels=48, num_blocks=4)),
    (yb.C3k, dict(out_channels=48, num_blocks=2, kernel_size=5)),
    (yb.C3K2, dict(out_channels=48, num_blocks=2)),
    (yb.C2PSA, dict(out_channels=32, num_blocks=2)),
    (yb.C2fCBAM, dict(out_channels=48, num_blocks=1)),
    (yb.ESE, dict()),
    (yb.LSKAttention, dict()),
    (yb.ConvMlp, dict()),
    (yb.LSKA, dict()),
    (yb.ESELSKA, dict()),
    (yb.SpatialAttention, dict()),
])
def test_single_input_blocks(cls, kw):
    out = _run(cls(**kw), X)
    want_c = kw.get('out_channels', 32)
    assert out.shape == (2, 16, 16, want_c)


@pytest.mark.parametrize('cls,out_c', [
    (yb.ASFFDown, 48), (yb.DASFF, 32), (yb.DCASFF, 32),
])
def test_two_input_fusion_blocks(cls, out_c):
    y = jnp.ones((2, 16, 16, 24))
    out = _run(cls(out_channels=out_c), X, y)
    if isinstance(out, tuple):
        out = out[0]
    assert out.shape == (2, 16, 16, out_c)


def test_aff_csp_halves_channels():
    y = jnp.ones((2, 16, 16, 16))
    out = _run(yb.AFF_CSP(), X, y)
    assert out.shape == (2, 16, 16, 16)
    out = _run(yb.iAFF_CSP(), X, y)
    assert out.shape == (2, 16, 16, 16)


def test_max_sigmoid_attn_and_csp():
    guide = jnp.ones((2, 5, 64))  # 5 guide tokens, 64 channels
    blk = yb.MaxSigmoidAttnBlock(out_channels=32, embed_channels=32,
                                 num_heads=2, with_scale=True)
    out = _run(blk, X, guide)
    assert out.shape == (2, 16, 16, 32)
    csp = yb.MaxSigmoidCSPLayerWithTwoConv(
        out_channels=48, guide_channels=64, embed_channels=16,
        num_blocks=1, num_heads=2, depth=2)
    out = _run(csp, X, guide)
    assert out.shape == (2, 16, 16, 48)
    rep = yb.RepConvMaxSigmoidCSPLayerWithTwoConv(
        out_channels=48, guide_channels=64, embed_channels=16,
        num_blocks=1, num_heads=2, depth=1)
    out = _run(rep, X, guide)
    assert out.shape == (2, 16, 16, 48)


def test_image_pooling_attention():
    text = jnp.ones((2, 7, 64))
    feats = [jnp.ones((2, 16, 16, 32)), jnp.ones((2, 8, 8, 48)),
             jnp.ones((2, 4, 4, 64))]
    mod = yb.ImagePoolingAttentionModule(text_channels=64,
                                         embed_channels=32, num_heads=4,
                                         with_scale=True)
    out = _run(mod, text, feats)
    assert out.shape == (2, 7, 64)


def test_dcattention_returns_positions():
    mod = yb.DCAttention(num_heads=4, stride=4)
    y = jnp.ones((2, 16, 16, 32))
    out, pos = _run(mod, X, y)
    assert out.shape == (2, 16, 16, 32)
    assert pos.shape == (2, 16, 2)  # (B, rh*rw=4*4, 2)
