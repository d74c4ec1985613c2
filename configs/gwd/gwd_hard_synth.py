# synth-hard protocol: the retinanet hard-synth recipe with the
# Gaussian-Wasserstein regression loss (see RESULTS.md "synth-hard").
_base_ = ['../rotated_retinanet/rotated_retinanet_hard_synth.py']
model = dict(
    bbox_head=dict(
        reg_decoded_bbox=True,
        loss_bbox=dict(_delete_=True, type='GDLoss', loss_type='gwd',
                       loss_weight=5.0)))
