# Production-shape synthetic config: the FULL R50-FPN retinanet at 1024 px
# (the flagship bench shape) over a dense 15-class synth-hard set, for
# measuring the host input pipeline against the device step rate at the
# shape real DOTA training runs at (tools/analysis_tools/loader_bench.py;
# VERDICT round-3 item 5). Model/schedule inherit the DOTA 1x config
# unchanged.
_base_ = ['./rotated_retinanet_obb_r50_fpn_1x_dota_le90.py']

angle_version = 'le90'
classes = ('plane', 'baseball-diamond', 'bridge', 'ground-track-field',
           'small-vehicle', 'large-vehicle', 'ship', 'tennis-court',
           'basketball-court', 'storage-tank', 'soccer-ball-field',
           'roundabout', 'harbor', 'swimming-pool', 'helicopter')
data_root = '/tmp/synth_hard1024/'
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='RResize', img_scale=(1024, 1024)),
    dict(type='RRandomFlip', flip_ratio=0.5, version='le90'),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels'])
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='RResize', img_scale=(1024, 1024)),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
    dict(type='Collect', keys=['img'])
]
data = dict(
    samples_per_gpu=8,
    workers_per_gpu=2,
    max_gt=512,
    pad_size=(1024, 1024),
    train=dict(
        _delete_=True,
        type='DOTADataset',
        classes=classes,
        version='le90',
        ann_file=data_root + 'trainval/annfiles/',
        img_prefix=data_root + 'trainval/images/',
        pipeline=train_pipeline),
    val=dict(
        _delete_=True,
        type='DOTADataset',
        classes=classes,
        version='le90',
        ann_file=data_root + 'val/annfiles/',
        img_prefix=data_root + 'val/images/',
        pipeline=test_pipeline),
    test=dict(
        _delete_=True,
        type='DOTADataset',
        classes=classes,
        version='le90',
        ann_file=data_root + 'val/annfiles/',
        img_prefix=data_root + 'val/images/',
        pipeline=test_pipeline))
pad_size = (1024, 1024)
evaluation = dict(interval=12, metric='mAP')
checkpoint_config = dict(interval=12)
