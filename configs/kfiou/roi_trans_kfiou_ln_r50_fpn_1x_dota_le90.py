# RoI-Transformer with a KFIoU stage-1 bbox head (reference same name).
_base_ = ['../roi_trans/roi_trans_r50_fpn_1x_dota_le90.py']
angle_version = 'le90'
model = dict(
    roi_head=dict(bbox_head=[
        dict(type='RotatedShared2FCBBoxHead',
             in_channels=256, fc_out_channels=1024, roi_feat_size=7,
             num_classes=15,
             bbox_coder=dict(type='DeltaXYWHAHBBoxCoder',
                             angle_range=angle_version,
                             norm_factor=2, edge_swap=True,
                             target_means=[0., 0., 0., 0., 0.],
                             target_stds=[0.1, 0.1, 0.2, 0.2, 1]),
             reg_class_agnostic=True,
             loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False,
                           loss_weight=1.0),
             loss_bbox=dict(type='SmoothL1Loss', beta=1.0 / 9.0,
                            loss_weight=1.0)),
        dict(type='RotatedKFIoUShared2FCBBoxHead',
             in_channels=256, fc_out_channels=1024, roi_feat_size=7,
             num_classes=15,
             bbox_coder=dict(type='DeltaXYWHAOBBoxCoder',
                             angle_range=angle_version,
                             norm_factor=None, edge_swap=True, proj_xy=True,
                             target_means=[0., 0., 0., 0., 0.],
                             target_stds=[0.05, 0.05, 0.1, 0.1, 0.5]),
             reg_class_agnostic=False,
             loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False,
                           loss_weight=1.0),
             loss_bbox=dict(type='KFLoss', fun='ln', loss_weight=5.0)),
    ]))
