# jy expanded-neck MSDCN prototype (reference
# configs/jy/expaned-neck-msdcn-head.py): YOLOv8PAFPN_E adds a stride-64
# downsample branch (4 output levels); the reference's
# BatchTaskAlignedAssigner is undefined in its own tree (SURVEY.md §2.11) —
# the working OBBLabelAssigner is used, as in the runnable prototypes.
_base_ = ['./prototype4.py']

last_stage_out_channels = 768
expanded_down_feat_channels = [1024]
bbox_in_channels = [256, 512, last_stage_out_channels, 1024]
regress_ranges = ((-1, 96), (96, 192), (192, 384), (384, 768))
featmap_strides = [8, 16, 32, 64]
num_classes = 15

model = dict(
    backbone=dict(
        _delete_=True,
        type='YOLOv8CSPDarknet',
        arch='P5',
        last_stage_out_channels=last_stage_out_channels,
        deepen_factor=0.67,
        widen_factor=0.75,
        norm_cfg=dict(type='BN', momentum=0.03, eps=0.001),
        act_cfg=dict(type='SiLU', inplace=True)),
    neck=dict(
        _delete_=True,
        type='YOLOv8PAFPN_E',
        deepen_factor=0.67,
        widen_factor=0.75,
        in_channels=[256, 512, last_stage_out_channels],
        out_channels=[256, 512, last_stage_out_channels],
        num_csp_blocks=3,
        norm_cfg=dict(type='BN', momentum=0.03, eps=0.001),
        act_cfg=dict(type='SiLU', inplace=True),
        expanded_down_feat_channels=expanded_down_feat_channels),
    bbox_head=dict(
        _delete_=True,
        type='RotatedMSDCNHead',
        num_classes=num_classes,
        in_channels=bbox_in_channels,
        regress_ranges=regress_ranges,
        widen_factor=0.75,
        norm_cfg=dict(type='BN', momentum=0.03, eps=0.001),
        act_cfg=dict(type='SiLU', inplace=True),
        featmap_strides=featmap_strides,
        bbox_coder=dict(type='DistanceAnglePointCoder',
                        angle_version='le90'),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type='RotatedIoULoss', loss_weight=1.0)),
    train_cfg=dict(
        assigner=dict(
            type='OBBLabelAssigner',
            regress_ranges=regress_ranges,
            featmap_strides=featmap_strides,
            num_classes=num_classes,
            topk=15)),
    test_cfg=dict(
        nms_pre=2000,
        min_bbox_size=0,
        score_thr=0.05,
        nms=dict(iou_thr=0.1),
        max_per_img=2000))
