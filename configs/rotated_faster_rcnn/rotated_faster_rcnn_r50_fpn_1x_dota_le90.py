# Rotated Faster R-CNN (reference same name; 73.40 mAP): HBB RPN + rotated
# RoI head via hbb2obb proposals.
_base_ = ['../oriented_rcnn/oriented_rcnn_r50_fpn_1x_dota_le90.py']
angle_version = 'le90'
model = dict(
    type='RotatedFasterRCNN',
    rpn_head=dict(
        _delete_=True,
        type='OrientedRPNHead',
        in_channels=256,
        feat_channels=256,
        version=angle_version,
        anchor_generator=dict(
            type='RotatedAnchorGenerator',
            scales=[8],
            ratios=[0.5, 1.0, 2.0],
            strides=[4, 8, 16, 32, 64]),
        bbox_coder=dict(
            type='MidpointOffsetCoder',
            angle_range=angle_version,
            target_means=[.0, .0, .0, .0, .0, .0],
            target_stds=[1.0, 1.0, 1.0, 1.0, 0.5, 0.5]),
        loss_cls=dict(
            type='CrossEntropyLoss', use_sigmoid=True, loss_weight=1.0),
        loss_bbox=dict(type='SmoothL1Loss', beta=0.1111111111111111,
                       loss_weight=1.0)))
