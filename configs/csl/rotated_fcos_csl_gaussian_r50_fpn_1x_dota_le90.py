# Rotated FCOS + CSL angle classification (reference
# configs/rotated_fcos/rotated_fcos_csl_gaussian_r50_fpn_1x_dota_le90.py,
# baseline 71.76 mAP).
_base_ = ['../rotated_fcos/rotated_fcos_r50_fpn_1x_dota_le90.py']
angle_version = 'le90'

model = dict(
    bbox_head=dict(
        type='CSLRFCOSHead',
        separate_angle=True,
        scale_angle=False,
        angle_coder=dict(
            type='CSLCoder',
            angle_version=angle_version,
            omega=1,
            window='gaussian',
            radius=6),
        loss_angle=dict(
            type='SmoothFocalLoss', gamma=2.0, alpha=0.25, loss_weight=0.8),
        h_bbox_coder=dict(type='DistancePointBBoxCoder'),
        loss_bbox=dict(type='IoULoss', loss_weight=1.0)))
