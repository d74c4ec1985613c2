# synth-hard protocol config (VERDICT round-3 item 3): R3Det cascade-refine
# on the crowded 15-class 512 px protocol. See RESULTS.md "synth-hard".
_base_ = ['./r3det_tiny_synth.py']

angle_version = 'oc'
model = dict(
    bbox_head=dict(num_classes=15),
    # list values replace the base wholesale (mmcv merge semantics)
    refine_heads=[dict(
        type='RotatedRetinaRefineHead',
        num_classes=15,
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
    test_cfg=dict(nms_pre=2000, min_bbox_size=0, score_thr=0.05,
                  nms=dict(iou_thr=0.1), max_per_img=800))

# ---- synth-hard data (see generate_synth.py --hard)
classes = ('plane', 'baseball-diamond', 'bridge', 'ground-track-field',
           'small-vehicle', 'large-vehicle', 'ship', 'tennis-court',
           'basketball-court', 'storage-tank', 'soccer-ball-field',
           'roundabout', 'harbor', 'swimming-pool', 'helicopter')
data_root = '/tmp/synth_hard/'
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile', cache='ram'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='RResize', img_scale=(512, 512)),
    dict(type='RRandomFlip', flip_ratio=0.5, version=angle_version),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels'])
]
test_pipeline = [
    dict(type='LoadImageFromFile', cache='ram'),
    dict(type='RResize', img_scale=(512, 512)),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
    dict(type='Collect', keys=['img'])
]
data = dict(
    samples_per_gpu=4,
    max_gt=256,
    pad_size=(512, 512),
    train=dict(classes=classes,
               ann_file=data_root + 'trainval/annfiles/',
               img_prefix=data_root + 'trainval/images/',
               pipeline=train_pipeline),
    val=dict(classes=classes,
             ann_file=data_root + 'val/annfiles/',
             img_prefix=data_root + 'val/images/',
             pipeline=test_pipeline),
    test=dict(classes=classes,
              ann_file=data_root + 'val/annfiles/',
              img_prefix=data_root + 'val/images/',
              pipeline=test_pipeline))
pad_size = (512, 512)
evaluation = dict(interval=10, metric='mAP')
checkpoint_config = dict(interval=20)
