# Rotated ATSS OBB le135 (reference same name; 72.29 mAP).
_base_ = ['./rotated_atss_obb_r50_fpn_1x_dota_le90.py']
angle_version = 'le135'
model = dict(
    bbox_head=dict(
        bbox_coder=dict(angle_range=angle_version)),
    train_cfg=dict(assigner=dict(angle_version=angle_version)))
data = dict(train=dict(version=angle_version),
            val=dict(version=angle_version),
            test=dict(version=angle_version))
