# Rotated RetinaNet OBB oc (reference same name).
_base_ = ['./rotated_retinanet_obb_r50_fpn_1x_dota_le90.py']
angle_version = 'oc'
model = dict(
    bbox_head=dict(
        bbox_coder=dict(
            angle_range=angle_version, edge_swap=False, proj_xy=False)))
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='RResize', img_scale=(1024, 1024)),
    dict(type='RRandomFlip', flip_ratio=0.5, version=angle_version),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
    dict(type='DefaultFormatBundle'),
    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels'])
]
data = dict(train=dict(pipeline=train_pipeline, version=angle_version),
            val=dict(version=angle_version),
            test=dict(version=angle_version))
