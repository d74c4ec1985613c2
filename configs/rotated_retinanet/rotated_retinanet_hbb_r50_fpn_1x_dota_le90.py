# Rotated RetinaNet HBB le90 (reference same name): assignment on the gts'
# circumscribed horizontal boxes.
_base_ = ['./rotated_retinanet_obb_r50_fpn_1x_dota_le90.py']
angle_version = 'le90'
model = dict(bbox_head=dict(assign_by_circumhbbox=angle_version))
