# jy Prototype4: RotatedYOLOv8 with CSPNeXt-M (0.67/0.75) — mirrors reference
# configs/jy/prototype4.py (baseline: 79.5 DOTA AP, BASELINE.md).
_base_ = [
    '../_base_/datasets/dotav1.py', '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py'
]

angle_version = 'le90'
deepen_factor = 0.67
widen_factor = 0.75
last_stage_out_channels = 768
num_classes = 15  # reference uses 16 with a bg slot quirk; see head docstring
regress_ranges = ((-1, 96), (96, 192), (192, 384))
featmap_strides = [8, 16, 32]

model = dict(
    type='RotatedYOLOv8',
    backbone=dict(
        type='CSPNeXt',
        arch='P5',
        last_stage_out_channels=last_stage_out_channels,
        deepen_factor=deepen_factor,
        widen_factor=widen_factor,
        norm_cfg=dict(type='BN', momentum=0.03, eps=0.001),
        act_cfg=dict(type='SiLU', inplace=True),
        cspnext_block=True),
    neck=dict(
        type='YOLOv8PAFPN',
        deepen_factor=deepen_factor,
        widen_factor=widen_factor,
        in_channels=[256, 512, 768],
        out_channels=[256, 512, 768],
        num_csp_blocks=3,
        norm_cfg=dict(type='BN', momentum=0.03, eps=0.001),
        act_cfg=dict(type='SiLU', inplace=True)),
    bbox_head=dict(
        type='RotatedYOLOv8Head',
        num_classes=num_classes,
        in_channels=[256, 512, 768],
        regress_ranges=regress_ranges,
        widen_factor=widen_factor,
        featmap_strides=featmap_strides,
        bbox_coder=dict(type='DistanceAnglePointCoder',
                        angle_version=angle_version),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type='RotatedIoULoss', loss_weight=1.0)),
    train_cfg=dict(
        assigner=dict(
            type='OBBLabelAssigner',
            regress_ranges=regress_ranges,
            featmap_strides=featmap_strides,
            num_classes=num_classes,
            topk=15)),
    test_cfg=dict(
        nms_pre=2000,
        min_bbox_size=0,
        score_thr=0.05,
        nms=dict(iou_thr=0.1),
        max_per_img=2000))

img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='RResize', img_scale=(1024, 1024)),
    dict(type='RRandomFlip', flip_ratio=0.5, version=angle_version),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
    dict(type='PolyRandomRotate',
         rotate_ratio=0.6,
         angles_range=180,
         auto_bound=False,
         rect_classes=[9, 11],
         version=angle_version),
    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels'])
]
data = dict(
    samples_per_gpu=8,
    train=dict(pipeline=train_pipeline, version=angle_version),
    val=dict(version=angle_version),
    test=dict(version=angle_version))

lr_config = dict(
    _delete_=True,
    policy='CosineAnnealing',
    by_epoch=False,
    warmup='linear',
    warmup_iters=1000,
    warmup_ratio=1.0 / 10,
    min_lr_ratio=1e-5,
    max_steps=100000)
optimizer = dict(type='sgd', lr=0.0025, momentum=0.9, weight_decay=0.0001)
optimizer_config = dict(grad_clip=dict(max_norm=10.0))
runner = dict(type='EpochBasedRunner', max_epochs=50)
