# Rotated FCOS + CSL gaussian angle classification (reference path
# rotated_fcos/...; the full spec lives in configs/csl/).
_base_ = ['../csl/rotated_fcos_csl_gaussian_r50_fpn_1x_dota_le90.py']
