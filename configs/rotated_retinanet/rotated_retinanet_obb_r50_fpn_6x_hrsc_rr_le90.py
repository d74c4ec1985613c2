# HRSC 6x + random rotation (reference same name; 52.06/84.80/58.10).
# Full spec lives in configs/hrsc/ (this repo's original location); this
# file keeps the reference's path as the canonical API surface.
_base_ = ['../hrsc/rotated_retinanet_obb_r50_fpn_6x_hrsc_rr_le90.py']
