# synth-hard protocol: the retinanet hard-synth recipe with
# Circular-Smooth-Label angle classification (see RESULTS.md "synth-hard").
_base_ = ['../rotated_retinanet/rotated_retinanet_hard_synth.py']
angle_version = 'le90'
model = dict(
    bbox_head=dict(
        type='CSLRRetinaHead',
        angle_coder=dict(
            type='CSLCoder',
            angle_version=angle_version,
            omega=4,
            window='gaussian',
            radius=6),
        loss_angle=dict(type='SmoothFocalLoss', gamma=2.0, alpha=0.25,
                        loss_weight=0.8),
        bbox_coder=dict(angle_range=angle_version)))
