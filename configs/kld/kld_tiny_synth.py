# Tiny synthetic-data KLD (stable) recipe (R18, 2 classes, 256 px): the
# retinanet tiny-synth protocol with the Kullback-Leibler regression loss —
# proves the GDLoss(kld) recipe converges (RESULTS.md).
_base_ = ['../rotated_retinanet/rotated_retinanet_tiny_synth.py']
model = dict(
    bbox_head=dict(
        reg_decoded_bbox=True,
        loss_bbox=dict(_delete_=True, type='GDLoss', loss_type='kld',
                       fun='log1p', tau=1.0, sqrt=False, loss_weight=9.5)))
