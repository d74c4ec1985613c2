# S2ANet with KFIoU (ln) losses (reference same name).
_base_ = ['../s2anet/s2anet_r50_fpn_1x_dota_le135.py']
model = dict(
    fam_head=dict(
        type='KFIoURRetinaHead',
        loss_bbox=dict(_delete_=True, type='KFLoss', fun='ln',
                       loss_weight=1.0)),
    odm_head=dict(
        type='KFIoUODMRefineHead',
        loss_bbox=dict(_delete_=True, type='KFLoss', fun='ln',
                       loss_weight=1.0)))
