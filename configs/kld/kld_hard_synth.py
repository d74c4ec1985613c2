# synth-hard protocol: the retinanet hard-synth recipe with the
# Kullback-Leibler regression loss (see RESULTS.md "synth-hard").
_base_ = ['../rotated_retinanet/rotated_retinanet_hard_synth.py']
model = dict(
    bbox_head=dict(
        reg_decoded_bbox=True,
        loss_bbox=dict(_delete_=True, type='GDLoss', loss_type='kld',
                       fun='log1p', tau=1.0, sqrt=False, loss_weight=9.5)))
