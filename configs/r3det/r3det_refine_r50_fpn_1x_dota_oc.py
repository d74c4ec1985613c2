# R3Det with TWO refine stages (reference same name).
_base_ = ['./r3det_r50_fpn_1x_dota_oc.py']
angle_version = 'oc'
refine_head = dict(
    type='RotatedRetinaRefineHead',
    num_classes=15,
    in_channels=256,
    stacked_convs=4,
    feat_channels=256,
    assign_by_circumhbbox=None,
    anchor_generator=dict(
        type='PseudoAnchorGenerator', strides=[8, 16, 32, 64, 128]),
    bbox_coder=dict(
        type='DeltaXYWHAOBBoxCoder',
        angle_range=angle_version,
        norm_factor=None,
        edge_swap=False,
        proj_xy=False,
        target_means=(0.0, 0.0, 0.0, 0.0, 0.0),
        target_stds=(1.0, 1.0, 1.0, 1.0, 1.0)),
    loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                  alpha=0.25, loss_weight=1.0),
    loss_bbox=dict(type='SmoothL1Loss', beta=0.11, loss_weight=1.0))
sr_stage = dict(
    assigner=dict(
        type='MaxIoUAssigner', pos_iou_thr=0.6, neg_iou_thr=0.5,
        min_pos_iou=0, ignore_iof_thr=-1,
        iou_calculator=dict(type='RBboxOverlaps2D')),
    allowed_border=-1, pos_weight=-1, debug=False)
model = dict(
    frm_cfgs=[
        dict(in_channels=256, featmap_strides=[8, 16, 32, 64, 128]),
        dict(in_channels=256, featmap_strides=[8, 16, 32, 64, 128])
    ],
    num_refine_stages=2,
    refine_heads=[refine_head, refine_head],
    train_cfg=dict(
        _delete_=True,
        s0=dict(
            assigner=dict(
                type='MaxIoUAssigner', pos_iou_thr=0.5, neg_iou_thr=0.4,
                min_pos_iou=0, ignore_iof_thr=-1,
                iou_calculator=dict(type='RBboxOverlaps2D')),
            allowed_border=-1, pos_weight=-1, debug=False),
        sr=[sr_stage, sr_stage],
        stage_loss_weights=[1.0, 1.0]))
