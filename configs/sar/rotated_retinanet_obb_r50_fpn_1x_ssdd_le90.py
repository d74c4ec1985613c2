# SAR ship detection (SSDD/HRSID; reference configs/sar/*).
_base_ = ['../rotated_retinanet/rotated_retinanet_obb_r50_fpn_1x_dota_le90.py']
angle_version = 'le90'
data = dict(
    train=dict(type='SARDataset', version=angle_version),
    val=dict(type='SARDataset', version=angle_version),
    test=dict(type='SARDataset', version=angle_version))
model = dict(bbox_head=dict(num_classes=1))
