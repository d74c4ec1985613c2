"""Device-side normalization path (round-4 input-pipeline fix).

The host pipeline's ``Normalize`` can be stripped
(``datasets.loader.strip_host_normalize``) and applied inside the jitted
step (``parallel.train_state.normalize_images``): uint8 host batches,
identical math. Known deviation: padded border pixels normalize to
-mean/std (black) instead of the host path's 0 — at production shapes
(fixed-size DOTA tiles) there is no padded border.
"""

import numpy as np

import jax.numpy as jnp

from orientedobjectdetection_tpu.datasets.loader import (pad_collate,
                                                         strip_host_normalize)
from orientedobjectdetection_tpu.datasets.pipelines import Normalize
from orientedobjectdetection_tpu.parallel.train_state import normalize_images

NORM = dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375],
            to_rgb=True)


def test_strip_host_normalize():
    cfg = dict(type='DOTADataset', pipeline=[
        dict(type='LoadImageFromFile'),
        dict(type='RResize', img_scale=(256, 256)),
        dict(type='Normalize', **NORM),
        dict(type='Pad', size_divisor=32),
    ])
    new_cfg, norm = strip_host_normalize(cfg)
    assert norm == NORM
    assert [t['type'] for t in new_cfg['pipeline']] == \
        ['LoadImageFromFile', 'RResize', 'Pad']
    # original untouched
    assert len(cfg['pipeline']) == 4

    no_norm = dict(type='DOTADataset', pipeline=[
        dict(type='LoadImageFromFile')])
    same, norm2 = strip_host_normalize(no_norm)
    assert norm2 is None and same['pipeline'] == no_norm['pipeline']


def test_device_normalize_matches_host_transform():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (32, 40, 3), np.uint8)
    host = Normalize(**NORM)({'img': img.copy()})['img']
    dev = np.asarray(normalize_images(jnp.asarray(img[None]), NORM))[0]
    np.testing.assert_allclose(dev, host, rtol=1e-6, atol=1e-5)


def test_device_normalize_no_rgb_flip():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (8, 8, 3), np.uint8)
    norm = dict(NORM, to_rgb=False)
    host = Normalize(**norm)({'img': img.copy()})['img']
    dev = np.asarray(normalize_images(jnp.asarray(img[None]), norm))[0]
    np.testing.assert_allclose(dev, host, rtol=1e-6, atol=1e-5)


def test_pad_collate_keeps_uint8():
    rng = np.random.default_rng(2)
    samples = [dict(img=rng.integers(0, 256, (16, 16, 3), np.uint8),
                    gt_bboxes=np.zeros((1, 5), np.float32),
                    gt_labels=np.zeros((1,), np.int64))
               for _ in range(2)]
    batch = pad_collate(samples, max_gt=4, pad_size=(16, 16))
    assert batch['images'].dtype == np.uint8
    # f32 samples keep the old contract
    samples_f = [dict(s, img=s['img'].astype(np.float32)) for s in samples]
    assert pad_collate(samples_f, max_gt=4,
                       pad_size=(16, 16))['images'].dtype == np.float32


def test_collate_then_device_norm_matches_host_path():
    """uint8 collate + device normalize == host normalize + f32 collate
    on the real-image region."""
    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 256, (16, 16, 3), np.uint8) for _ in range(3)]
    raw = [dict(img=im, gt_bboxes=np.zeros((0, 5), np.float32),
                gt_labels=np.zeros((0,), np.int64)) for im in imgs]
    normed = [dict(s, img=Normalize(**NORM)({'img': s['img'].copy()})['img'])
              for s in raw]
    dev = np.asarray(normalize_images(
        jnp.asarray(pad_collate(raw, max_gt=4)['images']), NORM))
    host = pad_collate(normed, max_gt=4)['images']
    np.testing.assert_allclose(dev, host, rtol=1e-6, atol=1e-5)
