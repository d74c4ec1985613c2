# S2ANet on HRSC, 3x schedule (reference same name; 89.75 AP50).
_base_ = ['./s2anet_r50_fpn_1x_dota_le135.py',
          '../_base_/datasets/hrsc.py']
model = dict(fam_head=dict(num_classes=1), odm_head=dict(num_classes=1))
lr_config = dict(
    policy='step', warmup='linear', warmup_iters=500, warmup_ratio=1.0 / 3,
    step=[24, 33])
runner = dict(type='EpochBasedRunner', max_epochs=36)
