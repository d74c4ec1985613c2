# jy coupled-objectness prototype (reference configs/jy/objectness-loss.py:
# 16-channel cls output split 15+1 objectness, indicator focal + BCE loss;
# the reference names type='ObjectnessLoss' which its tree never defines —
# aliased to the coupled ObjectnessLoss2 semantics here).
_base_ = ['./prototype4.py']
model = dict(
    bbox_head=dict(
        type='RotatedDecoupledObjHead',
        loss_cls=dict(_delete_=True, type='ObjectnessLoss', loss_weight=1.0,
                      obj_loss_weight=1.0, ver=2)))
optimizer = dict(
    _delete_=True, type='AdamW', lr=0.0001, betas=(0.9, 0.999),
    weight_decay=0.05)
