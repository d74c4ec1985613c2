# Tiny synthetic-data KFIoU recipe (R18, 2 classes, 256 px): the retinanet
# tiny-synth protocol with the Kalman-filter IoU head/loss — proves the
# KFIoURRetinaHead + KFLoss recipe converges (RESULTS.md).
_base_ = ['../rotated_retinanet/rotated_retinanet_tiny_synth.py']
model = dict(
    bbox_head=dict(
        type='KFIoURRetinaHead',
        loss_bbox=dict(_delete_=True, type='KFLoss', loss_weight=5.0)))
