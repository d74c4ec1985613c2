# CFA 40-epoch schedule (reference configs/cfa/cfa_r50_fpn_40e_dota_oc.py;
# 73.45 mAP).
_base_ = ['./cfa_r50_fpn_1x_dota_oc.py']

evaluation = dict(interval=40, metric='mAP')
lr_config = dict(
    policy='step',
    warmup='linear',
    warmup_iters=500,
    warmup_ratio=1.0 / 3,
    step=[24, 32, 38])
runner = dict(type='EpochBasedRunner', max_epochs=40)
checkpoint_config = dict(interval=10)
