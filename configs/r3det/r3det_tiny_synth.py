# Tiny synthetic-data R3Det (R18, 2 classes, 256 px, oc angles) — proves
# the cascade-refine family trains: s0 retina head -> FeatureRefineModule
# -> refine head on refined anchors (RESULTS.md).
_base_ = ['./r3det_r50_fpn_1x_dota_oc.py']

angle_version = 'oc'
model = dict(
    backbone=dict(depth=18, frozen_stages=-1, init_cfg=None),
    neck=dict(in_channels=[64, 128, 256, 512], out_channels=64),
    bbox_head=dict(num_classes=2, in_channels=64, feat_channels=64,
                   stacked_convs=1),
    frm_cfgs=[dict(in_channels=64, featmap_strides=[8, 16, 32, 64, 128])],
    # list values replace the base wholesale (mmcv merge semantics), so the
    # refine head must be fully specified
    refine_heads=[dict(
        type='RotatedRetinaRefineHead',
        num_classes=2,
        in_channels=64,
        stacked_convs=1,
        feat_channels=64,
        assign_by_circumhbbox=None,
        anchor_generator=dict(
            type='PseudoAnchorGenerator', strides=[8, 16, 32, 64, 128]),
        bbox_coder=dict(
            type='DeltaXYWHAOBBoxCoder',
            angle_range=angle_version,
            norm_factor=None,
            edge_swap=False,
            proj_xy=False,
            target_means=(0.0, 0.0, 0.0, 0.0, 0.0),
            target_stds=(1.0, 1.0, 1.0, 1.0, 1.0)),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type='SmoothL1Loss', beta=0.11, loss_weight=1.0))],
    test_cfg=dict(nms_pre=500, min_bbox_size=0, score_thr=0.05,
                  nms=dict(iou_thr=0.1), max_per_img=100))

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
optimizer = dict(lr=0.008)
lr_config = dict(step=[40, 46])
checkpoint_config = dict(interval=10)
evaluation = dict(interval=10, metric='mAP')
