"""New-component coverage: yolo blocks library, ConvNeXt/Swin backbones,
extended necks, head/loss aliases, dataset wrappers (SURVEY.md §2.6/§2.7)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope='module')
def feats():
    return tuple(jnp.zeros((1, s, s, c))
                 for s, c in [(16, 64), (8, 128), (4, 256)])


@pytest.fixture(scope='module')
def synth_dota(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp('dota_wrap')
    (root / 'trainval' / 'images').mkdir(parents=True)
    (root / 'trainval' / 'annfiles').mkdir(parents=True)
    for i in range(4):
        img = np.full((128, 128, 3), 80, np.uint8)
        cv2.imwrite(str(root / 'trainval' / 'images' / f'im_{i}.png'), img)
        lines = ['10.0 10.0 60.0 10.0 60.0 30.0 10.0 30.0 plane 0',
                 '40.0 60.0 90.0 80.0 80.0 100.0 30.0 80.0 ship 1']
        (root / 'trainval' / 'annfiles' / f'im_{i}.txt').write_text(
            '\n'.join(lines))
    return str(root)


def test_yolo_blocks_shapes():
    from orientedobjectdetection_tpu.models.yolo_blocks import (
        C3, CBAM, AFF, ESEAttn, LSKBlock, RepVGGBlock, SPPBottleneck,
        CSPSPPFBottleneck, iAFF)
    x = jnp.zeros((1, 8, 8, 32))
    for blk in [RepVGGBlock(32), SPPBottleneck(32), CSPSPPFBottleneck(32),
                C3(32), CBAM(), ESEAttn(), LSKBlock()]:
        v = jax.jit(blk.init)(jax.random.PRNGKey(0), x)
        assert jax.jit(blk.apply)(v, x).shape == x.shape, type(blk).__name__
    for blk in [AFF(), iAFF()]:
        v = jax.jit(blk.init)(jax.random.PRNGKey(0), x, x)
        assert jax.jit(blk.apply)(v, x, x).shape == x.shape


def test_asff_bifusion(feats):
    from orientedobjectdetection_tpu.models.yolo_blocks import ASFF, BiFusion
    m = ASFF(level=1, out_channels=64)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), feats)
    assert jax.jit(m.apply)(v, feats).shape == (1, 8, 8, 64)
    bf = BiFusion(64)
    up = jnp.zeros((1, 8, 8, 64))
    v = jax.jit(bf.init)(jax.random.PRNGKey(0), feats[1], up, feats[0])
    assert jax.jit(bf.apply)(v, feats[1], up, feats[0]).shape == \
        (1, 8, 8, 64)


def test_extended_necks(feats):
    from orientedobjectdetection_tpu.models.necks.pafpn import (
        YOLOv6RepPAFPN, YOLOv8PAFPN_E)
    m = YOLOv6RepPAFPN(in_channels=(64, 128, 256),
                       out_channels=(64, 128, 256), num_csp_blocks=2)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), feats)
    outs = jax.jit(m.apply)(v, feats)
    assert [o.shape[-1] for o in outs] == [64, 128, 256]
    m = YOLOv8PAFPN_E(in_channels=(64, 128, 256),
                      out_channels=(64, 128, 256), num_csp_blocks=1)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), feats)
    outs = jax.jit(m.apply)(v, feats)
    assert len(outs) == 4 and outs[-1].shape[1] == 2


@pytest.mark.parametrize('name', ['ConvNeXt', 'SwinTransformer'])
def test_modern_backbones(name):
    from orientedobjectdetection_tpu.utils.registry import BACKBONES
    m = BACKBONES.get(name)(arch='tiny', out_indices=(1, 2, 3))
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    outs = jax.jit(m.apply)(v, x)
    assert [o.shape[1] for o in outs] == [8, 4, 2]


def test_swin_shift_equals_builtin_window_count():
    # shifted block must not change shape and must differ from unshifted
    from orientedobjectdetection_tpu.models.backbones.swin import SwinBlock
    x = jnp.asarray(np.random.RandomState(0).rand(1, 14, 14, 32), jnp.float32)
    b0 = SwinBlock(32, 4, window_size=7, shift=0)
    b1 = SwinBlock(32, 4, window_size=7, shift=3)
    v0 = b0.init(jax.random.PRNGKey(0), x)
    y0 = b0.apply(v0, x)
    y1 = b1.apply(v0, x)
    assert y0.shape == x.shape
    assert not np.allclose(np.asarray(y0), np.asarray(y1))


def test_head_loss_aliases_registered():
    import orientedobjectdetection_tpu.models  # noqa: F401
    from orientedobjectdetection_tpu.utils.registry import HEADS, LOSSES
    for k in ['KFIoURRetinaRefineHead', 'KFIoUODMRefineHead',
              'RotatedYOLOv8AngleHead', 'RotatedDecoupled1x1ObjHead']:
        assert HEADS.get(k)
    assert LOSSES.get('BCConvexGIoULoss')


def test_bc_convex_giou_loss_gradient():
    from orientedobjectdetection_tpu.models.dense_heads. \
        rotated_reppoints_head import BCConvexGIoULoss
    pts = jnp.asarray(np.random.RandomState(0).rand(4, 18) * 10)
    poly = jnp.asarray(np.random.RandomState(1).rand(4, 8) * 10)
    loss = BCConvexGIoULoss()
    val, grad = jax.value_and_grad(lambda p: loss(p, poly))(pts)
    assert np.isfinite(float(val)) and np.isfinite(np.asarray(grad)).all()


def test_aug_multiclass_nms_rotated():
    from orientedobjectdetection_tpu.ops.nms import \
        aug_multiclass_nms_rotated
    boxes = np.array([[10, 10, 4, 2, 0.1, 0.9],
                      [10, 10, 4, 2, 0.1, 0.8],
                      [30, 30, 5, 3, 0.5, 0.7]], np.float32)
    labels = np.array([0, 0, 1])
    d, lb = aug_multiclass_nms_rotated(boxes, labels, 2, iou_thr=0.1)
    assert len(d) == 2 and list(lb) == [0, 1]
    assert d[0, 5] == pytest.approx(0.9)


def test_dataset_wrappers(synth_dota):
    from orientedobjectdetection_tpu.datasets import build_dataset
    base = dict(type='DOTADataset', version='le90',
                ann_file=synth_dota + '/trainval/annfiles/',
                img_prefix=synth_dota + '/trainval/images/',
                classes=('plane', 'ship'),
                pipeline=[dict(type='LoadImageFromFile'),
                          dict(type='LoadAnnotations', with_bbox=True),
                          dict(type='Collect',
                               keys=['img', 'gt_bboxes', 'gt_labels'])])
    n0 = len(build_dataset(dict(base)))
    cat = build_dataset(dict(type='ConcatDataset',
                             datasets=[dict(base), dict(base)]))
    assert len(cat) == 2 * n0
    assert cat[n0 + 1]['img'].shape == cat[1]['img'].shape
    cb = build_dataset(dict(type='ClassBalancedDataset', dataset=dict(base),
                            oversample_thr=0.9))
    assert len(cb) >= n0
    mix = build_dataset(dict(
        type='MultiImageMixDataset', dataset=dict(base),
        pipeline=[dict(type='RMosaic', img_scale=(128, 128)),
                  dict(type='RResize', img_scale=(128, 128))]))
    m = mix[0]
    assert m['img'].shape[:2] == (128, 128)
