# fp16 variant (reference same name; 75.63 mAP @ 21.2 fps).
_base_ = ['./oriented_rcnn_r50_fpn_1x_dota_le90.py']
fp16 = dict(loss_scale='dynamic')
