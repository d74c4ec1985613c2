# jy decoupled 1x1-objectness prototype (reference
# configs/jy/objectness-loss3.py).
_base_ = ['./prototype4.py']
num_classes = 15
model = dict(
    bbox_head=dict(
        type='RotatedDecoupled1x1ObjHead',
        num_classes=num_classes,
        loss_cls=dict(_delete_=True, type='ObjectnessLoss3',
                      loss_weight=1.0, obj_loss_weight=1.0, ver=1)),
    train_cfg=dict(
        assigner=dict(type='OBBLabelAssigner', num_classes=num_classes)))
optimizer = dict(
    _delete_=True, type='AdamW', lr=0.0001, betas=(0.9, 0.999),
    weight_decay=0.05)
runner = dict(type='EpochBasedRunner', max_epochs=12)
