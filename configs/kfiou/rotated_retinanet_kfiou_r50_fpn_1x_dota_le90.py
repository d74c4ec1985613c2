# KFIoU RetinaNet (reference configs/kfiou/..._le90.py; 69.60 mAP).
_base_ = ['../rotated_retinanet/rotated_retinanet_obb_r50_fpn_1x_dota_le90.py']
model = dict(
    bbox_head=dict(
        type='KFIoURRetinaHead',
        loss_bbox=dict(_delete_=True, type='KFLoss', fun='ln',
                       loss_weight=5.0)))
