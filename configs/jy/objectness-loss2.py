# jy decoupled-objectness prototype (reference configs/jy/objectness-loss2.py).
_base_ = ['./prototype4.py']
model = dict(
    bbox_head=dict(
        type='RotatedDecoupledObjHead',
        loss_cls=dict(_delete_=True, type='ObjectnessLoss3', ver=1,
                      loss_weight=1.0)))
