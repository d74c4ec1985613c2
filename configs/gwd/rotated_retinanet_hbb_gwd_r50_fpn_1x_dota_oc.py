# GWD RetinaNet (reference configs/gwd/...oc.py; 69.55 mAP): L1 -> GWD loss.
_base_ = ['../rotated_retinanet/rotated_retinanet_hbb_r50_fpn_1x_dota_oc.py']
model = dict(
    bbox_head=dict(
        reg_decoded_bbox=True,
        loss_bbox=dict(
            _delete_=True, type='GDLoss', loss_type='gwd', fun='log1p',
            tau=1.0, loss_weight=5.0)))
