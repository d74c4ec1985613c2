# ConvNeXt-T backbone + stable-KLD RetinaNet + AdamW (reference same name).
_base_ = ['../kld/rotated_retinanet_obb_kld_stable_r50_fpn_1x_dota_le90.py']
model = dict(
    backbone=dict(
        _delete_=True,
        type='ConvNeXt',
        arch='tiny',
        out_indices=(0, 1, 2, 3),
        drop_path_rate=0.4,
        layer_scale_init_value=1.0,
        gap_before_final_norm=False),
    neck=dict(in_channels=[96, 192, 384, 768]))
optimizer = dict(
    _delete_=True, type='AdamW', lr=0.0001, betas=(0.9, 0.999),
    weight_decay=0.05)
