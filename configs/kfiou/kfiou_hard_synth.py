# synth-hard protocol: the retinanet hard-synth recipe with the
# Kalman-filter IoU head/loss (see RESULTS.md "synth-hard").
_base_ = ['../rotated_retinanet/rotated_retinanet_hard_synth.py']
model = dict(
    bbox_head=dict(
        type='KFIoURRetinaHead',
        loss_bbox=dict(_delete_=True, type='KFLoss', loss_weight=5.0)))
