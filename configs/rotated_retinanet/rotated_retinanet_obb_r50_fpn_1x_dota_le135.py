# Rotated RetinaNet OBB R50 1x le135 (reference same name; 69.79 mAP).
_base_ = ['./rotated_retinanet_obb_r50_fpn_1x_dota_le90.py']
angle_version = 'le135'
model = dict(bbox_head=dict(bbox_coder=dict(angle_range=angle_version)))
