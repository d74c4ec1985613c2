# Tiny synthetic-data RotatedYOLOv8 (CSPNeXt 0.33/0.25, 2 classes, 256 px)
# — the jy-stack analog of rotated_retinanet_tiny_synth.py: proves the
# anchor-free cost-based OBBLabelAssigner + DistanceAnglePoint decode +
# RotatedIoULoss converge end-to-end (RESULTS.md).
_base_ = ['./prototype4.py']

angle_version = 'le90'
num_classes = 2
regress_ranges = ((-1, 48), (48, 96), (96, 192))
featmap_strides = [8, 16, 32]

model = dict(
    backbone=dict(deepen_factor=0.33, widen_factor=0.25,
                  last_stage_out_channels=768),
    neck=dict(deepen_factor=0.33, widen_factor=0.25),
    bbox_head=dict(num_classes=num_classes, widen_factor=0.25,
                   regress_ranges=regress_ranges),
    train_cfg=dict(assigner=dict(
        regress_ranges=regress_ranges, num_classes=num_classes, topk=9)),
    test_cfg=dict(nms_pre=500, score_thr=0.05, nms=dict(iou_thr=0.1),
                  max_per_img=100))

data_root = '/tmp/synth_dota/'
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='RResize', img_scale=(256, 256)),
    dict(type='RRandomFlip', flip_ratio=0.5, version=angle_version),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels'])
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='RResize', img_scale=(256, 256)),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
    dict(type='Collect', keys=['img'])
]
data = dict(
    samples_per_gpu=4,
    workers_per_gpu=2,
    max_gt=16,
    pad_size=(256, 256),
    train=dict(
        _delete_=True,
        type='DOTADataset',
        classes=('plane', 'ship'),
        version=angle_version,
        ann_file=data_root + 'trainval/annfiles/',
        img_prefix=data_root + 'trainval/images/',
        pipeline=train_pipeline),
    val=dict(
        _delete_=True,
        type='DOTADataset',
        classes=('plane', 'ship'),
        version=angle_version,
        ann_file=data_root + 'trainval/annfiles/',
        img_prefix=data_root + 'trainval/images/',
        pipeline=test_pipeline),
    test=dict(
        _delete_=True,
        type='DOTADataset',
        classes=('plane', 'ship'),
        version=angle_version,
        ann_file=data_root + 'trainval/annfiles/',
        img_prefix=data_root + 'trainval/images/',
        pipeline=test_pipeline))
pad_size = (256, 256)
optimizer = dict(_delete_=True, type='AdamW', lr=0.002, weight_decay=0.05)
lr_config = dict(_delete_=True, policy='CosineAnnealing', by_epoch=False,
                 warmup='linear', warmup_iters=300,
                 warmup_ratio=0.1, min_lr_ratio=0.05)
checkpoint_config = dict(interval=10)
evaluation = dict(interval=10, metric='mAP')
