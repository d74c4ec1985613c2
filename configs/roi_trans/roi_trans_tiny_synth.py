# Tiny synthetic-data RoI-Transformer (R18, 2 classes, 256 px) — proves the
# two-stage CASCADE trains end-to-end: HBB RPN -> stage-0 RoIAlign + HBB->OBB
# head -> stage-1 RoIAlignRotated + OBB head (RESULTS.md).
_base_ = ['./roi_trans_r50_fpn_1x_dota_le90.py']

angle_version = 'le90'
model = dict(
    backbone=dict(depth=18, frozen_stages=-1, init_cfg=None),
    neck=dict(in_channels=[64, 128, 256, 512], out_channels=64),
    rpn_head=dict(in_channels=64, feat_channels=64),
    roi_head=dict(
        bbox_roi_extractor=[
            dict(type='RotatedSingleRoIExtractor',
                 roi_layer=dict(type='RoIAlign', out_size=7, sample_num=2),
                 out_channels=64, featmap_strides=[4, 8, 16, 32]),
            dict(type='RotatedSingleRoIExtractor',
                 roi_layer=dict(type='RoIAlignRotated', out_size=7,
                                sample_num=2, clockwise=True),
                 out_channels=64, featmap_strides=[4, 8, 16, 32]),
        ],
        bbox_head=[
            dict(type='RotatedShared2FCBBoxHead',
                 in_channels=64, fc_out_channels=256, num_classes=2,
                 reg_class_agnostic=True,
                 bbox_coder=dict(type='DeltaXYWHAHBBoxCoder',
                                 angle_range=angle_version,
                                 norm_factor=2, edge_swap=True,
                                 target_means=(0., 0., 0., 0., 0.),
                                 target_stds=(0.1, 0.1, 0.2, 0.2, 0.1)),
                 loss_cls=dict(type='CrossEntropyLoss', loss_weight=1.0),
                 loss_bbox=dict(type='SmoothL1Loss', beta=1.0,
                                loss_weight=1.0)),
            dict(type='RotatedShared2FCBBoxHead',
                 in_channels=64, fc_out_channels=256, num_classes=2,
                 reg_class_agnostic=True,
                 bbox_coder=dict(type='DeltaXYWHAOBBoxCoder',
                                 angle_range=angle_version,
                                 norm_factor=None, edge_swap=True,
                                 proj_xy=True,
                                 target_means=(0., 0., 0., 0., 0.),
                                 target_stds=(0.05, 0.05, 0.1, 0.1, 0.05)),
                 loss_cls=dict(type='CrossEntropyLoss', loss_weight=1.0),
                 loss_bbox=dict(type='SmoothL1Loss', beta=1.0,
                                loss_weight=1.0)),
        ]),
    train_cfg=dict(
        rpn_proposal=dict(nms_pre=512, max_per_img=256),
        rcnn=[dict(sampler=dict(num=128)), dict(sampler=dict(num=128))]),
    test_cfg=dict(
        rpn=dict(nms_pre=512, max_per_img=256),
        rcnn=dict(nms_pre=256, score_thr=0.05, nms=dict(iou_thr=0.1),
                  max_per_img=100)))

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
optimizer = dict(lr=0.005)
lr_config = dict(step=[40, 46])
checkpoint_config = dict(interval=10)
evaluation = dict(interval=10, metric='mAP')
