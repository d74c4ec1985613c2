# Rotated RetinaNet HBB-assign R50 1x oc (reference same name; 64.55 mAP).
_base_ = ['./rotated_retinanet_obb_r50_fpn_1x_dota_le90.py']
angle_version = 'oc'
model = dict(
    bbox_head=dict(
        assign_by_circumhbbox=angle_version,
        bbox_coder=dict(
            angle_range=angle_version,
            edge_swap=False,
            proj_xy=False)))
