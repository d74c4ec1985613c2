# fp16 variant (reference same name; 68.79 mAP @ 22.4 fps). On TPU the
# mixed-precision policy is bf16 (no loss scaling needed) — the fp16 dict is
# kept for config-surface parity and enables the bf16 compute dtype.
_base_ = ['./rotated_retinanet_obb_r50_fpn_1x_dota_le90.py']
fp16 = dict(loss_scale='dynamic')
