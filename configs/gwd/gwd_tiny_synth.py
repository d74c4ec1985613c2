# Tiny synthetic-data GWD recipe (R18, 2 classes, 256 px): the retinanet
# tiny-synth protocol with the Gaussian-Wasserstein regression loss —
# proves the GDLoss(gwd) recipe converges (RESULTS.md).
_base_ = ['../rotated_retinanet/rotated_retinanet_tiny_synth.py']
model = dict(
    bbox_head=dict(
        reg_decoded_bbox=True,
        loss_bbox=dict(_delete_=True, type='GDLoss', loss_type='gwd',
                       loss_weight=5.0)))
