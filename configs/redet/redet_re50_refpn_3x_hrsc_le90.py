# ReDet on HRSC, 3x schedule (reference same name; 90.40 AP50).
_base_ = ['./redet_re50_refpn_1x_dota_le90.py',
          '../_base_/datasets/hrsc.py']
model = dict(roi_head=dict(bbox_head=dict(num_classes=1)))
lr_config = dict(
    policy='step', warmup='linear', warmup_iters=500, warmup_ratio=1.0 / 3,
    step=[24, 33])
runner = dict(type='EpochBasedRunner', max_epochs=36)
