# Rotated RetinaNet on HRSC2016 (reference
# rotated_retinanet_obb_r50_fpn_6x_hrsc_rr_le90.py; 52.06/84.80/58.10).
_base_ = ['../rotated_retinanet/rotated_retinanet_obb_r50_fpn_1x_dota_le90.py']
angle_version = 'le90'
dataset_type = 'HRSCDataset'
data_root = 'data/hrsc/'
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='RResize', img_scale=(800, 512)),
    dict(type='RRandomFlip', flip_ratio=0.5, version=angle_version),
    dict(type='PolyRandomRotate', rotate_ratio=0.5, angles_range=180,
         auto_bound=False, version=angle_version),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels'])
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='RResize', img_scale=(800, 512)),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
    dict(type='Collect', keys=['img'])
]
data = dict(
    train=dict(
        _delete_=True,
        type=dataset_type,
        classwise=False,
        version=angle_version,
        ann_file=data_root + 'ImageSets/trainval.txt',
        img_prefix=data_root + 'FullDataSet/',
        pipeline=train_pipeline),
    val=dict(
        _delete_=True,
        type=dataset_type,
        classwise=False,
        version=angle_version,
        ann_file=data_root + 'ImageSets/test.txt',
        img_prefix=data_root + 'FullDataSet/',
        pipeline=test_pipeline),
    test=dict(
        _delete_=True,
        type=dataset_type,
        classwise=False,
        version=angle_version,
        ann_file=data_root + 'ImageSets/test.txt',
        img_prefix=data_root + 'FullDataSet/',
        pipeline=test_pipeline))
model = dict(bbox_head=dict(num_classes=1))
runner = dict(max_epochs=72)

# 6x schedule (reference _base_/schedules/schedule_6x.py)
lr_config = dict(
    policy='step', warmup='linear', warmup_iters=500, warmup_ratio=1.0 / 3,
    step=[48, 66])
runner = dict(type='EpochBasedRunner', max_epochs=72)
