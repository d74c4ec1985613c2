# jy Prototype3: RotatedYOLOv8 with CSPNeXt-L (1.0/1.25) + MSARC aux stage —
# mirrors reference configs/jy/prototype3.py (79.4 DOTA AP). The reference's
# BatchTaskAlignedAssigner is not defined in-tree (stale config; SURVEY.md
# §2.11 note) — the working assigner is OBBLabelAssigner as in prototype4.
_base_ = ['./prototype4.py']
deepen_factor = 1.0
widen_factor = 1.25
last_stage_out_channels = 768
model = dict(
    backbone=dict(
        type='CSPNeXtLarge',
        deepen_factor=deepen_factor,
        widen_factor=widen_factor,
        last_stage_out_channels=last_stage_out_channels,
        stage_aux=1,
        reverse=True),
    neck=dict(
        deepen_factor=deepen_factor,
        widen_factor=widen_factor),
    bbox_head=dict(widen_factor=widen_factor))
data = dict(samples_per_gpu=16)
