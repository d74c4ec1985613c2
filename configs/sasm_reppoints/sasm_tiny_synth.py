# Tiny synthetic-data SASM (R18, 2 classes, 256 px): SAMRepPointsHead with
# shape-adaptive weighting + SASAssigner refine — proves the SASM recipe
# converges (RESULTS.md).
_base_ = ['./sasm_reppoints_r50_fpn_1x_dota_oc.py']

angle_version = 'oc'
model = dict(
    backbone=dict(depth=18, frozen_stages=-1, init_cfg=None),
    neck=dict(in_channels=[64, 128, 256, 512], out_channels=64),
    bbox_head=dict(num_classes=2, in_channels=64, feat_channels=64,
                   point_feat_channels=64, stacked_convs=2),
    test_cfg=dict(nms_pre=500, score_thr=0.05, nms=dict(iou_thr=0.4),
                  max_per_img=100))

data_root = "/tmp/synth_dota/"
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="RResize", img_scale=(256, 256)),
    dict(type="RRandomFlip", flip_ratio=0.5, version=angle_version),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
    dict(type="Collect", keys=["img", "gt_bboxes", "gt_labels"])
]
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="RResize", img_scale=(256, 256)),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
    dict(type="Collect", keys=["img"])
]
data = dict(
    samples_per_gpu=4,
    workers_per_gpu=2,
    max_gt=16,
    pad_size=(256, 256),
    train=dict(
        _delete_=True,
        type="DOTADataset",
        classes=("plane", "ship"),
        version=angle_version,
        ann_file=data_root + "trainval/annfiles/",
        img_prefix=data_root + "trainval/images/",
        pipeline=train_pipeline),
    val=dict(
        _delete_=True,
        type="DOTADataset",
        classes=("plane", "ship"),
        version=angle_version,
        ann_file=data_root + "trainval/annfiles/",
        img_prefix=data_root + "trainval/images/",
        pipeline=test_pipeline),
    test=dict(
        _delete_=True,
        type="DOTADataset",
        classes=("plane", "ship"),
        version=angle_version,
        ann_file=data_root + "trainval/annfiles/",
        img_prefix=data_root + "trainval/images/",
        pipeline=test_pipeline))
pad_size = (256, 256)
optimizer = dict(lr=0.005)
lr_config = dict(step=[40, 46])
checkpoint_config = dict(interval=10)
evaluation = dict(interval=10, metric="mAP")
