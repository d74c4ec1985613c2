# synth-hard protocol config: 15 classes, crowded 8-32 px instances at
# 512 px. See RESULTS.md "synth-hard".
_base_ = ['./cfa_tiny_synth.py']

angle_version = 'le135'

model = dict(
    bbox_head=dict(num_classes=15),
    test_cfg=dict(nms_pre=2000, score_thr=0.05, nms=dict(iou_thr=0.4),
                  max_per_img=800))

# ---- synth-hard data: 15 classes, 100-600 crowded instances/scene,
# 8-32 px objects (tools/data/synth/generate_synth.py --hard, 512 px).
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
