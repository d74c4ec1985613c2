# R3Det tiny with KFIoU (ln) (reference same name).
_base_ = ['./r3det_kfiou_ln_r50_fpn_1x_dota_oc.py']
refine_head = dict(
    type='KFIoURRetinaRefineHead',
    num_classes=15,
    in_channels=256,
    stacked_convs=2,
    feat_channels=256,
    assign_by_circumhbbox=None,
    anchor_generator=dict(
        type='PseudoAnchorGenerator', strides=[8, 16, 32, 64, 128]),
    bbox_coder=dict(
        type='DeltaXYWHAOBBoxCoder',
        angle_range='oc',
        norm_factor=None,
        edge_swap=False,
        proj_xy=False,
        target_means=(0.0, 0.0, 0.0, 0.0, 0.0),
        target_stds=(1.0, 1.0, 1.0, 1.0, 1.0)),
    loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                  alpha=0.25, loss_weight=1.0),
    loss_bbox=dict(type='KFLoss', fun='ln', loss_weight=5.0))
model = dict(
    bbox_head=dict(stacked_convs=2),
    refine_heads=[refine_head])
