# jy MSDCN-head prototype (reference configs/jy/msdcn-head.py).
_base_ = ['./prototype4.py']
model = dict(
    backbone=dict(
        _delete_=True,
        type='YOLOv8CSPDarknet',
        arch='P5',
        last_stage_out_channels=768,
        deepen_factor=0.67,
        widen_factor=0.75),
    bbox_head=dict(type='RotatedMSDCNHead'))
