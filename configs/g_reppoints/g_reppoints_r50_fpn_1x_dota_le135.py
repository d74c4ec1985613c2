# G-RepPoints (reference configs/g_reppoints/...le135.py; 69.49 mAP):
# KLD point-set losses + ATSS-KLD refine assignment.
_base_ = ['../rotated_reppoints/rotated_reppoints_r50_fpn_1x_dota_oc.py']

angle_version = 'le135'

model = dict(
    bbox_head=dict(
        version=angle_version,
        type='KLDRepPointsHead',
        loss_bbox_init=dict(type='KLDRepPointsLoss'),
        loss_bbox_refine=dict(type='KLDRepPointsLoss')),
    train_cfg=dict(
        refine=dict(
            assigner=dict(_delete_=True, type='ATSSKldAssigner', topk=9))))
