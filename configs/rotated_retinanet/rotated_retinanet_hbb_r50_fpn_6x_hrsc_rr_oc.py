# HRSC 6x HBB oc (reference same name; 45.09/79.30/46.90).
_base_ = ['./rotated_retinanet_obb_r50_fpn_6x_hrsc_rr_le90.py']
angle_version = 'oc'
model = dict(
    bbox_head=dict(
        assign_by_circumhbbox=angle_version,
        bbox_coder=dict(
            angle_range=angle_version, edge_swap=False, proj_xy=False)))
data = dict(train=dict(version=angle_version),
            val=dict(version=angle_version),
            test=dict(version=angle_version))
