# synth-hard protocol: the oriented-rcnn hard-synth recipe on the
# C8-equivariant ReResNet/ReFPN backbone with RiRoIAlignRotated
# (see RESULTS.md "synth-hard").
_base_ = ['../oriented_rcnn/oriented_rcnn_hard_synth.py']

model = dict(
    type='ReDet',
    backbone=dict(
        _delete_=True,
        type='ReResNet',
        depth=18,
        num_stages=4,
        out_indices=(0, 1, 2, 3),
        frozen_stages=-1,
        style='pytorch'),
    neck=dict(
        _delete_=True,
        type='ReFPN',
        in_channels=[256, 512, 1024, 2048],
        out_channels=64,
        num_outs=5),
    rpn_head=dict(in_channels=64, feat_channels=64),
    roi_head=dict(
        bbox_roi_extractor=dict(
            out_channels=64,
            roi_layer=dict(
                _delete_=True,
                type='RiRoIAlignRotated',
                out_size=7,
                num_samples=2,
                num_orientations=8,
                clockwise=True)),
        bbox_head=dict(in_channels=64, fc_out_channels=256)))
