# Rotated RetinaNet HBB le135 (reference same name): assignment on the gts'
# circumscribed horizontal boxes.
_base_ = ['./rotated_retinanet_obb_r50_fpn_1x_dota_le135.py']
angle_version = 'le135'
model = dict(bbox_head=dict(assign_by_circumhbbox=angle_version))
