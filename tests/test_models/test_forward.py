"""Config-driven forward tests over EVERY model family (model: reference
``tests/test_models/test_forward.py:56-120``, which parametrizes 15+
single-stage configs plus two-stage/refine): load a real config, shrink the
backbone/heads/test_cfg, fabricate inputs, run train loss + eval-mode decode
under jit. Unlike the reference (GPU-gated), these run on CPU; the shrunk
test cfgs (64px images, nms_pre<=100, max_candidates<=128) keep each
config's XLA compile small, and the package's persistent compilation cache
makes re-runs fast."""

import copy
import os.path as osp

import numpy as np
import pytest

import jax
import jax.numpy as jnp

CFG_DIR = osp.join(osp.dirname(__file__), '..', '..', 'configs')

CONFIGS = [
    'rotated_retinanet/rotated_retinanet_obb_r50_fpn_1x_dota_le90.py',
    'rotated_retinanet/rotated_retinanet_hbb_r50_fpn_1x_dota_oc.py',
    'rotated_retinanet/rotated_retinanet_obb_r50_fpn_1x_dota_le135.py',
    'rotated_atss/rotated_atss_obb_r50_fpn_1x_dota_le90.py',
    'rotated_fcos/rotated_fcos_r50_fpn_1x_dota_le90.py',
    'rotated_fcos/rotated_fcos_sep_angle_r50_fpn_1x_dota_le90.py',
    'jy/expaned-neck-msdcn-head.py',
    'csl/rotated_retinanet_obb_csl_gaussian_r50_fpn_fp16_1x_dota_le90.py',
    'csl/rotated_fcos_csl_gaussian_r50_fpn_1x_dota_le90.py',
    'gwd/rotated_retinanet_hbb_gwd_r50_fpn_1x_dota_oc.py',
    'kld/rotated_retinanet_obb_kld_stable_r50_fpn_1x_dota_le90.py',
    'kfiou/rotated_retinanet_kfiou_r50_fpn_1x_dota_le90.py',
    'rotated_reppoints/rotated_reppoints_r50_fpn_1x_dota_oc.py',
    'oriented_reppoints/oriented_reppoints_r50_fpn_1x_dota_le135.py',
    'sasm_reppoints/sasm_reppoints_r50_fpn_1x_dota_oc.py',
    'cfa/cfa_r50_fpn_1x_dota_le135.py',
    'g_reppoints/g_reppoints_r50_fpn_1x_dota_le135.py',
    'r3det/r3det_r50_fpn_1x_dota_oc.py',
    's2anet/s2anet_r50_fpn_1x_dota_le135.py',
    'oriented_rcnn/oriented_rcnn_r50_fpn_1x_dota_le90.py',
    'rotated_faster_rcnn/rotated_faster_rcnn_r50_fpn_1x_dota_le90.py',
    'gliding_vertex/gliding_vertex_r50_fpn_1x_dota_le90.py',
    'roi_trans/roi_trans_r50_fpn_1x_dota_le90.py',
    'redet/redet_re50_refpn_1x_dota_le90.py',
    'jy/prototype4.py',
]

# gradient flow is checked on one single-stage and one two-stage config
# (grad compile doubles the test cost; loss-finiteness covers the rest)
GRAD_CONFIGS = {
    'rotated_retinanet/rotated_retinanet_obb_r50_fpn_1x_dota_le90.py',
    'oriented_rcnn/oriented_rcnn_r50_fpn_1x_dota_le90.py',
}

C = 32  # shrunk channel width


def _shrink_head(h):
    h = dict(h)
    for key, val in [('in_channels', C), ('feat_channels', C),
                     ('point_feat_channels', C), ('stacked_convs', 1),
                     ('fc_out_channels', 64)]:
        if key in h and isinstance(h[key], int):
            h[key] = val
    if 'bbox_head' in h:                       # roi_head with inner head(s)
        inner = h['bbox_head']
        if isinstance(inner, (list, tuple)):
            h['bbox_head'] = [_shrink_head(x) for x in inner]
        else:
            h['bbox_head'] = _shrink_head(inner)
    if 'bbox_roi_extractor' in h:
        ext = h['bbox_roi_extractor']
        if isinstance(ext, (list, tuple)):
            h['bbox_roi_extractor'] = [dict(x, out_channels=C) for x in ext]
        else:
            h['bbox_roi_extractor'] = dict(ext, out_channels=C)
    return h


def _tiny_test_cfg(tc):
    if tc is None:
        return None
    tc = dict(tc)
    if any(isinstance(v, dict) and ('nms_pre' in v or 'max_per_img' in v
                                    or 'max_num' in v)
           for v in tc.values()):
        return {k: _tiny_test_cfg(v) if isinstance(v, dict) else v
                for k, v in tc.items()}
    if 'nms_pre' in tc:
        tc['nms_pre'] = 100
    for k in ('max_per_img', 'max_num'):
        if k in tc:
            tc[k] = 20
    tc['max_candidates'] = 128
    return tc


def _shrink(model_cfg):
    m = copy.deepcopy(dict(model_cfg))
    bt = m['backbone'].get('type', 'ResNet')
    if bt in ('ResNet',):
        m['backbone'] = dict(type='ResNet', depth=18, num_stages=4,
                             out_indices=(0, 1, 2, 3))
        bb_out = [64, 128, 256, 512]
    elif bt == 'ReResNet':
        m['backbone'] = dict(type='ReResNet', depth=18, num_stages=4,
                             out_indices=(0, 1, 2, 3))
        bb_out = [256, 512, 1024, 2048]
    elif bt in ('CSPNeXt', 'CSPNeXtLarge', 'YOLOv8CSPDarknet'):
        m['backbone'] = dict(m['backbone'], deepen_factor=0.33,
                             widen_factor=0.125)
        bb_out = None
    else:
        bb_out = None

    if m.get('neck') is not None:
        neck = dict(m['neck'])
        if bb_out is not None and 'in_channels' in neck:
            neck['in_channels'] = bb_out
        if isinstance(neck.get('out_channels'), int):
            neck['out_channels'] = C
        if 'widen_factor' in neck or neck.get('type', '').startswith(
                ('YOLOv8', 'YOLOv6')):
            neck = dict(neck, deepen_factor=0.33, widen_factor=0.125)
        m['neck'] = neck

    for key in ('bbox_head', 'rpn_head', 'roi_head', 'fam_head', 'odm_head'):
        if m.get(key) is not None:
            m[key] = _shrink_head(m[key])
    if m.get('refine_heads') is not None:
        m['refine_heads'] = [_shrink_head(h) for h in m['refine_heads']]
    if m.get('frm_cfgs') is not None:
        m['frm_cfgs'] = [dict(c, in_channels=C) for c in m['frm_cfgs']]
    if m.get('align_cfgs') is not None:
        m['align_cfgs'] = dict(m['align_cfgs'], channels=C)

    m['test_cfg'] = _tiny_test_cfg(m.get('test_cfg'))
    tc = m.get('train_cfg')
    if tc is not None:
        tc = copy.deepcopy(dict(tc))
        if 'rpn_proposal' in tc:
            tc['rpn_proposal'] = _tiny_test_cfg(tc['rpn_proposal'])
        if isinstance(tc.get('rcnn'), dict) and 'sampler' in tc['rcnn']:
            tc['rcnn'] = dict(tc['rcnn'],
                              sampler=dict(tc['rcnn']['sampler'], num=32))
        if isinstance(tc.get('rcnn'), (list, tuple)):
            tc['rcnn'] = [dict(s, sampler=dict(s['sampler'], num=32))
                          if 'sampler' in s else s for s in tc['rcnn']]
        m['train_cfg'] = tc
    return m


def _demo_inputs(batch=1, size=64, num_gt=4, num_classes=15, seed=0):
    rng = np.random.default_rng(seed)
    images = jnp.asarray(rng.normal(size=(batch, size, size, 3)),
                         jnp.float32)
    cx = rng.uniform(14, size - 14, (batch, num_gt))
    cy = rng.uniform(14, size - 14, (batch, num_gt))
    w = rng.uniform(10, 24, (batch, num_gt))
    h = rng.uniform(6, 14, (batch, num_gt))
    a = rng.uniform(-np.pi / 2, np.pi / 2, (batch, num_gt))
    return dict(
        images=images,
        gt_bboxes=jnp.asarray(np.stack([cx, cy, w, h, a], -1), jnp.float32),
        gt_labels=jnp.asarray(rng.integers(0, num_classes,
                                           (batch, num_gt)), jnp.int32),
        gt_mask=jnp.ones((batch, num_gt), bool))


def _build(cfg_name):
    from orientedobjectdetection_tpu.models import build_detector
    from orientedobjectdetection_tpu.utils import Config
    cfg = Config.fromfile(osp.join(CFG_DIR, cfg_name))
    return build_detector(_shrink(cfg.model))


@pytest.mark.parametrize('cfg_name', CONFIGS)
def test_config_forward_train_and_infer(cfg_name):
    det = _build(cfg_name)
    batch = _demo_inputs()
    variables = jax.jit(det.init)(jax.random.PRNGKey(0), batch['images'])

    def train_losses(v):
        out = det.apply(v, batch['images'], batch=batch, train=True,
                        rng=jax.random.PRNGKey(1))
        return det.loss_from_outputs(out, batch)

    losses = jax.jit(train_losses)(variables)
    for k, v in losses.items():
        assert np.isfinite(float(v)), f'{cfg_name}: {k} not finite'
    cls_keys = [k for k in losses if 'cls' in k]
    assert cls_keys and any(float(losses[k]) > 0 for k in cls_keys)

    if cfg_name in GRAD_CONFIGS:
        def total(params):
            v = {'params': params,
                 **{k: x for k, x in variables.items() if k != 'params'}}
            return sum(jnp.asarray(x) for x in train_losses(v).values())
        g = jax.jit(jax.grad(total))(variables['params'])
        gnorm = float(sum(jnp.sum(x * x)
                          for x in jax.tree.leaves(g)) ** 0.5)
        assert np.isfinite(gnorm) and gnorm > 0, f'{cfg_name}: bad grads'

    def infer(v):
        out = det.apply(v, batch['images'])
        return det.bboxes_from_outputs(out)

    dets, labels, valid = jax.jit(infer)(variables)
    assert dets.shape[-1] == 6
    assert dets.shape[0] == batch['images'].shape[0]
    assert np.isfinite(np.asarray(dets)).all()
    v = np.asarray(valid)
    lab = np.asarray(labels)
    assert (lab[v] >= 0).all()


def test_no_gt_corner_case():
    """Reference head tests check the no-gt case explicitly."""
    det = _build(
        'rotated_retinanet/rotated_retinanet_obb_r50_fpn_1x_dota_le90.py')
    batch = _demo_inputs()
    batch['gt_mask'] = jnp.zeros_like(batch['gt_mask'])
    variables = jax.jit(det.init)(jax.random.PRNGKey(0), batch['images'])

    def train_losses(v):
        out = det.apply(v, batch['images'])
        return det.loss_from_outputs(out, batch)

    losses = jax.jit(train_losses)(variables)
    assert float(losses['loss_bbox']) == 0
    assert float(losses['loss_cls']) > 0  # background focal loss
