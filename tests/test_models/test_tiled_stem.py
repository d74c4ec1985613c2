"""TiledStemConv must be bit-for-bit the same FUNCTION as the 7x7/2 conv.

The stem rewrite (space-to-depth(4) -> 3x3 conv -> depth-to-space(2),
``models/backbones/resnet.py``) exists purely for TPU MXU utilization; any
numerical divergence beyond dtype roundoff would silently break converted
reference checkpoints (reference stem: mmdet ResNet ``conv1``, used by every
``configs/rotated_retinanet/*.py``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orientedobjectdetection_tpu.models.backbones.resnet import (
    ResNet, TiledStemConv)


def _plain_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), [(3, 3)] * 2,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


@pytest.mark.parametrize('hw', [(64, 64), (96, 64)])
def test_tiled_stem_matches_plain_conv(hw):
    rng = jax.random.PRNGKey(0)
    h, w = hw
    x = jax.random.normal(rng, (2, h, w, 3), jnp.float32)
    stem = TiledStemConv(features=64, dtype=jnp.float32)
    variables = stem.init(rng, x)
    y_tiled = stem.apply(variables, x)
    y_plain = _plain_conv(x, variables['params']['kernel'])
    assert y_tiled.shape == y_plain.shape == (2, h // 2, w // 2, 64)
    np.testing.assert_allclose(np.asarray(y_tiled), np.asarray(y_plain),
                               atol=1e-4, rtol=1e-4)


def test_tiled_stem_fallback_odd_size():
    """Non-multiple-of-4 inputs take the plain-conv fallback, same result."""
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (1, 66, 70, 3), jnp.float32)
    stem = TiledStemConv(features=64, dtype=jnp.float32)
    variables = stem.init(rng, x)
    y = stem.apply(variables, x)
    y_ref = _plain_conv(x, variables['params']['kernel'])
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-4, rtol=1e-4)


def test_resnet_param_tree_unchanged():
    """The stem swap must not move the checkpoint key: conv1/kernel stays
    (7, 7, 3, 64) so ``tools/model_converters`` output loads unchanged."""
    rng = jax.random.PRNGKey(0)
    net = ResNet(depth=50, out_indices=(0, 1, 2, 3))
    variables = net.init(rng, jnp.zeros((1, 64, 64, 3)))
    k = variables['params']['conv1']['kernel']
    assert k.shape == (7, 7, 3, 64)
    assert k.dtype == jnp.float32
