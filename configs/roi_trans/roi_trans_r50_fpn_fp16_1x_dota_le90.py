# fp16 variant (reference same name). On TPU the mixed-precision policy is
# bf16; the fp16 dict is config-surface parity.
_base_ = ['./roi_trans_r50_fpn_1x_dota_le90.py']
fp16 = dict(loss_scale='dynamic')
