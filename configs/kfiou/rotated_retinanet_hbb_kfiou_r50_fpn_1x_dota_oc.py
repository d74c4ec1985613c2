# KFIoU RetinaNet HBB oc (reference same name).
_base_ = ['../rotated_retinanet/rotated_retinanet_obb_r50_fpn_1x_dota_oc.py']
angle_version = 'oc'
model = dict(
    bbox_head=dict(
        type='KFIoURRetinaHead',
        assign_by_circumhbbox=angle_version,
        loss_bbox=dict(_delete_=True, type='KFLoss', loss_weight=5.0)))
