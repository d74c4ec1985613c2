"""DOTA dataset + pipeline + loader tests (fabricated annotations, like
reference tests/test_data/test_datasets/test_dota.py)."""

import os
import os.path as osp

import cv2
import numpy as np
import pytest


@pytest.fixture(scope='module')
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('dota')
    (root / 'images').mkdir()
    (root / 'annfiles').mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        img = np.full((128, 128, 3), 80, np.uint8)
        cv2.imwrite(str(root / 'images' / f'im_{i}.png'), img)
        lines = [
            '10.0 10.0 60.0 10.0 60.0 30.0 10.0 30.0 plane 0',
            '40.0 60.0 90.0 80.0 80.0 100.0 30.0 80.0 ship 1',
            '0 0 1 0 1 1 0 1 plane 0',  # degenerate, must be dropped
        ]
        (root / 'annfiles' / f'im_{i}.txt').write_text('\n'.join(lines))
    return str(root)


def make_pipeline():
    return [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True),
        dict(type='RResize', img_scale=(128, 128)),
        dict(type='RRandomFlip', flip_ratio=0.0, version='le90'),
        dict(type='Normalize', mean=[0, 0, 0], std=[1, 1, 1], to_rgb=True),
        dict(type='Pad', size_divisor=32),
        dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels']),
    ]


def test_load_annotations(synth_root):
    from orientedobjectdetection_tpu.datasets import DOTADataset
    ds = DOTADataset(ann_file=osp.join(synth_root, 'annfiles'),
                     img_prefix=osp.join(synth_root, 'images'),
                     pipeline=make_pipeline(), version='le90',
                     classes=('plane', 'ship'))
    assert len(ds) == 4
    ann = ds.get_ann_info(0)
    assert ann['bboxes'].shape == (2, 5)   # degenerate box dropped
    assert list(ann['labels']) == [0, 1]
    # first box is axis-aligned 50x20
    np.testing.assert_allclose(ann['bboxes'][0],
                               [35, 20, 50, 20, 0], atol=1e-3)


def test_getitem_and_loader(synth_root):
    from orientedobjectdetection_tpu.datasets import DataLoader, DOTADataset
    ds = DOTADataset(ann_file=osp.join(synth_root, 'annfiles'),
                     img_prefix=osp.join(synth_root, 'images'),
                     pipeline=make_pipeline(), version='le90',
                     classes=('plane', 'ship'))
    sample = ds[0]
    assert sample['img'].shape == (128, 128, 3)
    assert sample['gt_bboxes'].shape[1] == 5

    loader = DataLoader(ds, batch_size=2, max_gt=8, pad_size=(128, 128),
                        num_workers=2, shuffle=True)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b['images'].shape == (2, 128, 128, 3)
    assert b['gt_bboxes'].shape == (2, 8, 5)
    assert b['gt_mask'].sum() == 4   # 2 gts per image


def test_process_pool_loader_matches_threads(synth_root):
    """worker_type='process' (the mmcv subprocess-dataloader analog) must
    yield bit-identical batches to the thread pool for a deterministic
    pipeline (flip_ratio=0, same shuffle seed)."""
    from orientedobjectdetection_tpu.datasets import DataLoader, DOTADataset
    ds = DOTADataset(ann_file=osp.join(synth_root, 'annfiles'),
                     img_prefix=osp.join(synth_root, 'images'),
                     pipeline=make_pipeline(), version='le90',
                     classes=('plane', 'ship'))
    kw = dict(batch_size=2, max_gt=8, pad_size=(128, 128),
              num_workers=2, shuffle=True, seed=3)
    lt = DataLoader(ds, worker_type='thread', **kw)
    lp = DataLoader(ds, worker_type='process', **kw)
    try:
        for bt, bp in zip(list(lt), list(lp)):
            for k in ('images', 'gt_bboxes', 'gt_labels', 'gt_mask'):
                np.testing.assert_array_equal(bt[k], bp[k])
    finally:
        lp.close()
    with pytest.raises(ValueError):
        DataLoader(ds, batch_size=1, worker_type='greenlet')


def test_dataset_sharding(synth_root):
    from orientedobjectdetection_tpu.datasets import DataLoader, DOTADataset
    ds = DOTADataset(ann_file=osp.join(synth_root, 'annfiles'),
                     img_prefix=osp.join(synth_root, 'images'),
                     pipeline=make_pipeline(), version='le90',
                     classes=('plane', 'ship'))
    l0 = DataLoader(ds, batch_size=1, shuffle=False, shard_id=0,
                    num_shards=2, num_workers=1)
    l1 = DataLoader(ds, batch_size=1, shuffle=False, shard_id=1,
                    num_shards=2, num_workers=1)
    assert len(l0) == 2 and len(l1) == 2


def test_merge_det_translates_patches(synth_root):
    from orientedobjectdetection_tpu.datasets import DOTADataset
    ds = DOTADataset.__new__(DOTADataset)
    ds.CLASSES = ('plane',)
    ds.version = 'le90'
    ds.data_infos = [dict(filename='big__0___0.png'),
                     dict(filename='big__100___0.png')]
    # same physical object seen in two overlapping patches
    det_a = np.array([[110., 50., 40., 20., 0.1, 0.9]], np.float32)
    det_b = np.array([[10., 50., 40., 20., 0.1, 0.8]], np.float32)
    ids, merged = ds.merge_det([[det_a], [det_b]])
    assert ids == ['big']
    out = merged[0][0]
    assert out.shape[0] == 1          # NMS merged the duplicate
    np.testing.assert_allclose(out[0, :2], [110, 50], atol=1e-3)
    assert out[0, 5] == pytest.approx(0.9)
