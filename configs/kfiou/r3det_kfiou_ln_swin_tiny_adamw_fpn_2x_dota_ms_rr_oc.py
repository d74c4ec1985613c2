# 2x-schedule variant (reference same name).
_base_ = ['./r3det_kfiou_ln_swin_tiny_adamw_fpn_1x_dota_ms_rr_oc.py']
lr_config = dict(
    policy='step', warmup='linear', warmup_iters=500, warmup_ratio=1.0 / 3,
    step=[16, 22])
runner = dict(type='EpochBasedRunner', max_epochs=24)
