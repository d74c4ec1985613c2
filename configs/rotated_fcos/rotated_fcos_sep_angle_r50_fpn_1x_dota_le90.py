# Rotated FCOS with a separate angle branch (reference same name; 71.28).
_base_ = 'rotated_fcos_r50_fpn_1x_dota_le90.py'
angle_version = 'le90'
model = dict(
    bbox_head=dict(
        separate_angle=True,
        scale_angle=True,
        h_bbox_coder=dict(type='DistancePointBBoxCoder'),
        loss_bbox=dict(_delete_=True, type='GIoULoss', loss_weight=1.0),
        loss_angle=dict(type='L1Loss', loss_weight=0.2)))
