# Oriented R-CNN on SSDD, 6x schedule (reference same name).
_base_ = ['./oriented_rcnn_r50_fpn_1x_dota_le90.py',
          '../_base_/datasets/ssdd.py']
model = dict(roi_head=dict(bbox_head=dict(num_classes=1)))
lr_config = dict(
    policy='step', warmup='linear', warmup_iters=500, warmup_ratio=1.0 / 3,
    step=[48, 66])
runner = dict(type='EpochBasedRunner', max_epochs=72)
