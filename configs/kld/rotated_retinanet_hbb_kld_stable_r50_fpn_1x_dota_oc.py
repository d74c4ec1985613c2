# KLD-stable RetinaNet HBB oc (reference same name; 69.55-70.22 family).
_base_ = ['../rotated_retinanet/rotated_retinanet_hbb_r50_fpn_1x_dota_oc.py']
model = dict(
    bbox_head=dict(
        reg_decoded_bbox=True,
        loss_bbox=dict(
            _delete_=True, type='GDLoss', loss_type='kld', fun='log1p',
            tau=1.0, sqrt=False, loss_weight=9.5)))
