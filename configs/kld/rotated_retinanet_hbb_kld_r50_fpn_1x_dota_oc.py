# KLD RetinaNet HBB oc (reference same name).
_base_ = ['../rotated_retinanet/rotated_retinanet_hbb_r50_fpn_1x_dota_oc.py']
model = dict(
    bbox_head=dict(
        reg_decoded_bbox=True,
        loss_bbox=dict(
            _delete_=True, type='GDLoss_v1', loss_type='kld', fun='log1p',
            tau=1, loss_weight=1.0)))
