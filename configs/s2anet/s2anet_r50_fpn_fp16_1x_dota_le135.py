# fp16 S2ANet (reference same name; 74.19 mAP).
_base_ = ['./s2anet_r50_fpn_1x_dota_le135.py']
fp16 = dict(loss_scale='dynamic')
