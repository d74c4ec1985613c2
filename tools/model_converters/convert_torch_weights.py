"""Convert PyTorch (mmrotate/mmdet/torchvision) checkpoints to this
framework's flax variables.

Covers every north-star family (VERDICT round-2 item #3): the converter
knows one mapping per reference module family and assembles them per
detector type, tracking which source keys were consumed so callers can
assert zero unmapped / zero leftover keys.

Reference module naming (all cited into /root/reference):
- ResNet/FPN:   mmdet naming (``backbone.layer1.0.conv1.weight`` ...)
- RetinaHead:   ``mmrotate/models/dense_heads/rotated_retina_head.py:67-94``
  (cls_convs/reg_convs ConvModules + retina_cls/retina_reg)
- RPN heads:    ``rotated_rpn_head.py:37-41`` (rpn_conv/rpn_cls/rpn_reg;
  OrientedRPNHead only widens rpn_reg, ``oriented_rpn_head.py:18-24``)
- ConvFC bbox:  ``roi_heads/bbox_heads/convfc_rbbox_head.py`` (shared_fcs,
  fc_cls, fc_reg) and GV's 4-branch ``gv_bbox_head.py`` (+fc_fix, fc_ratio)
- FCOS:         ``rotated_fcos_head.py:105-125`` (GN ConvModules, conv_cls/
  conv_reg/conv_angle/conv_centerness, per-level scales + one scale_angle)
- S2ANet:       ``detectors/s2anet.py:33-48`` (fam_head retina naming,
  align_conv.ac.{i}.deform_conv per stride, odm_head with ORConv2d
  ``models/utils/orconv.py:52-57`` weight (out, in, nOr, k, k))
- R3Det:        ``detectors/r3det.py:39-41`` (bbox_head + ModuleLists
  feat_refine_module.{i} / refine_head.{i})

Layout rules:
- torch conv weight OIHW  -> flax HWIO  (transpose 2,3,1,0)
- torch linear (out,in)   -> flax (in,out)
- BN -> FrozenBatchNorm params (scale/bias) + batch_stats (mean/var)
- DeformConv2d (out,in,kh,kw) -> align Dense ((kh*kw)*in, out) tap-major
  (matches ``ops/feature_align.py:align_conv_sample`` tap layout)
- ORConv2d (out,in,nOr,kh,kw) -> (kh*kw, in, nOr, out)

Usage:
    python tools/model_converters/convert_torch_weights.py \
        ref_checkpoint.pth out_variables.msgpack --type OrientedRCNN
"""

import argparse
import os.path as osp
import re
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..'))

# torch keys that carry no weights (buffers, bookkeeping)
_IGNORED = re.compile(
    r'(num_batches_tracked$|\.indices$|anchor_generator|prior_generator'
    r'|\.filter$|_iter$)')


class SourceState(dict):
    """State-dict wrapper that records which keys each mapper consumed."""

    def __init__(self, state):
        super().__init__(state)
        self.consumed = set()

    def take(self, key):
        self.consumed.add(key)
        return self[key]

    def items_under(self, prefix):
        for key in self:
            if key.startswith(prefix):
                yield key, key[len(prefix):]

    def leftovers(self):
        return sorted(k for k in self
                      if k not in self.consumed and not _IGNORED.search(k))


def convert_conv(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def convert_linear(w):
    return np.ascontiguousarray(w.T)


def convert_deform_to_dense(w):
    """(out, in, kh, kw) -> ((kh*kw)*in, out), tap-major to match
    ``align_conv_sample``'s (..., k*k, C) layout."""
    o, i, kh, kw = w.shape
    return np.ascontiguousarray(
        np.transpose(w, (2, 3, 1, 0)).reshape(kh * kw * i, o))


def convert_orconv(w):
    """(out, in, nOr, kh, kw) -> (kh*kw, in, nOr, out)."""
    o, i, n, kh, kw = w.shape
    return np.ascontiguousarray(
        np.transpose(w, (3, 4, 1, 2, 0)).reshape(kh * kw, i, n, o))


def set_in(tree, path, value):
    d = tree
    for k in path[:-1]:
        d = d.setdefault(k, {})
    d[path[-1]] = value


def _bn(params, stats, path, field, val):
    if field == 'weight':
        set_in(params, path + ('scale',), val)
    elif field == 'bias':
        set_in(params, path + ('bias',), val)
    elif field == 'running_mean':
        set_in(stats, path + ('mean',), val)
    elif field == 'running_var':
        set_in(stats, path + ('var',), val)


def _conv_or_bias(params, path, field, val):
    if field == 'weight':
        set_in(params, path + ('kernel',), convert_conv(val))
    else:
        set_in(params, path + ('bias',), val)


def _fc(params, path, field, val):
    if field == 'weight':
        set_in(params, path + ('kernel',), convert_linear(val))
    else:
        set_in(params, path + ('bias',), val)


# ---------------------------------------------------------------------------
# module-family mappers
# ---------------------------------------------------------------------------

def torch_resnet_to_flax(state, prefix: str = 'backbone.'):
    """mmdet/torchvision ResNet names -> our ResNet module tree.

    torch: conv1, bn1, layer{s}.{j}.conv{k}/bn{k}, layer{s}.{j}.downsample.0/1
    ours:  conv1, bn1, layer{s}_{j}/conv{k}|bn{k}|downsample_conv|downsample_bn
    """
    params, stats = {}, {}
    for key, name in list(state.items_under(prefix)):
        val = np.asarray(state[key])
        m = re.match(r'layer(\d+)\.(\d+)\.(.*)', name)
        if name == 'conv1.weight':
            set_in(params, ('conv1', 'kernel'), convert_conv(val))
        elif name.startswith('bn1.'):
            field = name.split('.', 1)[1]
            if field == 'num_batches_tracked':
                continue
            _bn(params, stats, ('bn1',), field, val)
        elif m:
            s, j, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            block = f'layer{s}_{j}'
            cm = re.match(r'conv(\d)\.weight$', rest)
            bm = re.match(r'bn(\d)\.(.*)', rest)
            dm = re.match(r'downsample\.(\d)\.(.*)', rest)
            if cm:
                set_in(params, (block, f'conv{cm.group(1)}', 'kernel'),
                       convert_conv(val))
            elif bm:
                if bm.group(2) == 'num_batches_tracked':
                    continue
                _bn(params, stats, (block, f'bn{bm.group(1)}'),
                    bm.group(2), val)
            elif dm:
                if dm.group(1) == '0':   # conv
                    set_in(params, (block, 'downsample_conv', 'kernel'),
                           convert_conv(val))
                else:                    # bn
                    if dm.group(2) == 'num_batches_tracked':
                        continue
                    _bn(params, stats, (block, 'downsample_bn'),
                        dm.group(2), val)
            else:
                continue
        else:
            continue
        state.consumed.add(key)
    return params, stats


def torch_fpn_to_flax(state, prefix: str = 'neck.'):
    """mmdet FPN: lateral_convs.{i}.conv, fpn_convs.{i}.conv.

    mmdet appends extra-conv params into ``fpn_convs`` past the lateral
    count; our FPN names them ``extra_{k}``, so indices >= the lateral
    count are remapped."""
    n_lateral = len({k for k, n in state.items_under(prefix)
                     if n.startswith('lateral_convs.')
                     and n.endswith('.conv.weight')})
    params = {}
    for key, name in list(state.items_under(prefix)):
        val = np.asarray(state[key])
        m = re.match(r'lateral_convs\.(\d+)\.conv\.(weight|bias)', name)
        f = re.match(r'fpn_convs\.(\d+)\.conv\.(weight|bias)', name)
        if m:
            _conv_or_bias(params, (f'lateral_{m.group(1)}',), m.group(2),
                          val)
        elif f:
            i = int(f.group(1))
            our = f'fpn_{i}' if i < n_lateral else f'extra_{i - n_lateral}'
            _conv_or_bias(params, (our,), f.group(2), val)
        else:
            continue
        state.consumed.add(key)
    return params


def torch_retina_head_to_flax(state, prefix: str = 'bbox_head.',
                              out_names=(('retina_cls', 'cls_out'),
                                         ('retina_reg', 'reg_out'))):
    """Retina-style towers: cls_convs.{i}.conv, reg_convs.{i}.conv + the
    (ref_name -> our_name) output convs. Also used for FAM and R3Det
    refine heads, which share the naming."""
    params = {}
    for key, name in list(state.items_under(prefix)):
        val = np.asarray(state[key])
        hit = False
        for tower in ('cls', 'reg'):
            m = re.match(rf'{tower}_convs\.(\d+)\.conv\.(weight|bias)$',
                         name)
            if m:
                _conv_or_bias(params, (f'{tower}_conv_{m.group(1)}',),
                              m.group(2), val)
                hit = True
        for ref_name, our_name in out_names:
            m = re.match(rf'{ref_name}\.(weight|bias)$', name)
            if m:
                _conv_or_bias(params, (our_name,), m.group(1), val)
                hit = True
        if hit:
            state.consumed.add(key)
    return params


def torch_rpn_head_to_flax(state, prefix: str = 'rpn_head.'):
    """Rotated/Oriented RPN: rpn_conv, rpn_cls, rpn_reg
    (``rotated_rpn_head.py:37-41``)."""
    params = {}
    for key, name in list(state.items_under(prefix)):
        val = np.asarray(state[key])
        m = re.match(r'(rpn_conv|rpn_cls|rpn_reg)\.(weight|bias)$', name)
        if m:
            _conv_or_bias(params, (m.group(1),), m.group(2), val)
            state.consumed.add(key)
    return params


def torch_convfc_head_to_flax(state, prefix: str = 'roi_head.bbox_head.'):
    """Shared2FC bbox heads (+ GV's fix/ratio branches)."""
    params = {}
    for key, name in list(state.items_under(prefix)):
        val = np.asarray(state[key])
        m = re.match(r'shared_fcs\.(\d+)\.(weight|bias)$', name)
        f = re.match(r'(fc_cls|fc_reg|fc_fix|fc_ratio)\.(weight|bias)$',
                     name)
        if m:
            _fc(params, (f'shared_fc_{m.group(1)}',), m.group(2), val)
        elif f:
            _fc(params, (f.group(1),), f.group(2), val)
        else:
            continue
        state.consumed.add(key)
    return params


def torch_fcos_head_to_flax(state, prefix: str = 'bbox_head.',
                            num_levels: int = 5):
    """RotatedFCOSHead (``rotated_fcos_head.py:105-125``): GN ConvModule
    towers, 4 output convs, per-level scales, one shared scale_angle
    (broadcast to our per-level scale_angle_{i})."""
    params = {}
    for key, name in list(state.items_under(prefix)):
        val = np.asarray(state[key])
        hit = False
        for tower in ('cls', 'reg'):
            m = re.match(rf'{tower}_convs\.(\d+)\.conv\.(weight|bias)$',
                         name)
            g = re.match(rf'{tower}_convs\.(\d+)\.gn\.(weight|bias)$', name)
            if m:
                _conv_or_bias(params, (f'{tower}_conv_{m.group(1)}',),
                              m.group(2), val)
                hit = True
            elif g:
                field = 'scale' if g.group(2) == 'weight' else 'bias'
                set_in(params, (f'{tower}_gn_{g.group(1)}', field), val)
                hit = True
        m = re.match(
            r'(conv_cls|conv_reg|conv_angle|conv_centerness)'
            r'\.(weight|bias)$', name)
        if m:
            _conv_or_bias(params, (m.group(1),), m.group(2), val)
            hit = True
        m = re.match(r'scales\.(\d+)\.scale$', name)
        if m:
            set_in(params, (f'scale_{m.group(1)}', 'scale'),
                   val.reshape(()))
            hit = True
        if name == 'scale_angle.scale':
            # reference shares ONE angle scale across levels
            # (rotated_fcos_head.py:125); ours is per-level -> broadcast
            for lvl in range(num_levels):
                set_in(params, (f'scale_angle_{lvl}', 'scale'),
                       val.reshape(()))
            hit = True
        if hit:
            state.consumed.add(key)
    return params


def torch_odm_head_to_flax(state, prefix: str = 'odm_head.'):
    """ODMRefineHead (``odm_refine_head.py:61-99``): ORConv2d + towers."""
    params = {}
    for key, name in list(state.items_under(prefix)):
        val = np.asarray(state[key])
        hit = False
        if name == 'or_conv.weight':
            set_in(params, ('or_conv', 'kernel'), convert_orconv(val))
            hit = True
        elif name == 'or_conv.bias':
            set_in(params, ('or_conv', 'bias'), val)
            hit = True
        for tower in ('cls', 'reg'):
            m = re.match(rf'{tower}_convs\.(\d+)\.conv\.(weight|bias)$',
                         name)
            if m:
                _conv_or_bias(params, (f'{tower}_conv_{m.group(1)}',),
                              m.group(2), val)
                hit = True
        m = re.match(r'(odm_cls|odm_reg)\.(weight|bias)$', name)
        if m:
            _conv_or_bias(params, (m.group(1),), m.group(2), val)
            hit = True
        if hit:
            state.consumed.add(key)
    return params


def torch_align_conv_to_flax(state, prefix: str = 'align_conv.'):
    """AlignConvModule: ac.{i}.deform_conv.weight per stride
    (``detectors/utils.py:105-133``) -> align_proj_{i} Dense."""
    params = {}
    for key, name in list(state.items_under(prefix)):
        m = re.match(r'ac\.(\d+)\.deform_conv\.weight$', name)
        if m:
            set_in(params, (f'align_proj_{m.group(1)}', 'kernel'),
                   convert_deform_to_dense(np.asarray(state[key])))
            state.consumed.add(key)
    return params


def torch_feat_refine_to_flax(state, prefix: str):
    """FeatureRefineModule: conv_5_1 / conv_1_5 / conv_1_1
    (``detectors/utils.py:162-174``)."""
    params = {}
    for key, name in list(state.items_under(prefix)):
        m = re.match(r'(conv_5_1|conv_1_5|conv_1_1)\.(weight|bias)$', name)
        if m:
            _conv_or_bias(params, (m.group(1),), m.group(2),
                          np.asarray(state[key]))
            state.consumed.add(key)
    return params


# ---------------------------------------------------------------------------
# per-detector assembly
# ---------------------------------------------------------------------------

def _backbone_neck(state):
    bb_params, bb_stats = torch_resnet_to_flax(state, 'backbone.')
    neck_params = torch_fpn_to_flax(state, 'neck.')
    params = {'backbone': bb_params}
    if neck_params:
        params['neck'] = neck_params
    return params, {'backbone': bb_stats}


def _assemble_single_stage(state):
    params, stats = _backbone_neck(state)
    params['bbox_head'] = torch_retina_head_to_flax(state, 'bbox_head.')
    return params, stats


def _assemble_fcos(state):
    params, stats = _backbone_neck(state)
    params['bbox_head'] = torch_fcos_head_to_flax(state, 'bbox_head.')
    return params, stats


def _assemble_two_stage(state):
    params, stats = _backbone_neck(state)
    params['rpn_head'] = torch_rpn_head_to_flax(state, 'rpn_head.')
    params['roi_head'] = {'bbox_head': torch_convfc_head_to_flax(
        state, 'roi_head.bbox_head.')}
    return params, stats


def _assemble_roi_trans(state):
    params, stats = _backbone_neck(state)
    params['rpn_head'] = torch_rpn_head_to_flax(state, 'rpn_head.')
    roi = {}
    for i in (0, 1):
        roi[f'bbox_head_{i}'] = torch_convfc_head_to_flax(
            state, f'roi_head.bbox_head.{i}.')
    params['roi_head'] = roi
    return params, stats


def _assemble_s2anet(state):
    params, stats = _backbone_neck(state)
    params['fam_head'] = torch_retina_head_to_flax(state, 'fam_head.')
    params['align_conv'] = torch_align_conv_to_flax(state, 'align_conv.')
    params['odm_head'] = torch_odm_head_to_flax(state, 'odm_head.')
    return params, stats


def _assemble_r3det(state):
    params, stats = _backbone_neck(state)
    params['bbox_head'] = torch_retina_head_to_flax(state, 'bbox_head.')
    for i in range(8):   # num_refine_stages is 1-2 in every config
        fr = torch_feat_refine_to_flax(state, f'feat_refine_module.{i}.')
        if not fr:
            break
        params[f'feat_refine_{i}'] = fr
        params[f'refine_head_{i}'] = torch_retina_head_to_flax(
            state, f'refine_head.{i}.')
    return params, stats


ASSEMBLERS = {
    'RotatedRetinaNet': _assemble_single_stage,
    'RotatedATSS': _assemble_single_stage,
    'KFIoU': _assemble_single_stage,
    'RotatedFCOS': _assemble_fcos,
    'OrientedRCNN': _assemble_two_stage,
    'RotatedFasterRCNN': _assemble_two_stage,
    'GlidingVertex': _assemble_two_stage,
    'RoITransformer': _assemble_roi_trans,
    'S2ANet': _assemble_s2anet,
    'R3Det': _assemble_r3det,
}


def convert_checkpoint(state_dict, detector_type: str = 'RotatedRetinaNet'):
    """Full detector state dict -> {'params': ..., 'batch_stats': ...}.

    Returns (variables, leftover_keys). leftover_keys lists every source
    key that no mapper consumed (ignoring known no-weight buffers) — an
    exact-coverage conversion has ``leftover_keys == []``.
    """
    state = state_dict if isinstance(state_dict, SourceState) \
        else SourceState(state_dict)
    try:
        assembler = ASSEMBLERS[detector_type]
    except KeyError:
        raise ValueError(
            f'no converter for detector type {detector_type!r}; '
            f'known: {sorted(ASSEMBLERS)}') from None
    params, stats = assembler(state)
    return ({'params': params, 'batch_stats': stats}, state.leftovers())


# ---------------------------------------------------------------------------
# synthesis (inverse direction) — builds a reference-named state dict from
# our own variables, used by tests to prove exact round-trip coverage
# without real checkpoints in reach.
# ---------------------------------------------------------------------------

def _inv_conv(v):
    return np.ascontiguousarray(np.transpose(np.asarray(v), (3, 2, 0, 1)))


def _walk(tree, path=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _walk(v, path + (k,))
        else:
            yield path + (k,), np.asarray(v)


def synthesize_reference_state(variables, detector_type: str,
                               num_levels: int = 5):
    """Our flax variables -> a torch-style state dict with reference names.

    The inverse of :func:`convert_checkpoint` for testing: every emitted
    key uses the reference's module naming, every tensor the torch layout.
    """
    params = variables['params']
    stats = variables.get('batch_stats', {})
    out = {}

    def put(key, val):
        out[key] = val

    for path, v in _walk(params):
        top = path[0]
        if top == 'backbone':
            _synth_resnet(put, path[1:], v, 'backbone.')
        elif top == 'neck':
            n_lat = sum(1 for k in params['neck']
                        if k.startswith('lateral_'))
            _synth_fpn(put, path[1:], v, 'neck.', n_lat)
        elif top in ('bbox_head', 'fam_head') and \
                detector_type != 'RotatedFCOS':
            _synth_retina(put, path[1:], v, f'{top}.')
        elif top == 'bbox_head':   # FCOS
            _synth_fcos(put, path[1:], v, 'bbox_head.', num_levels)
        elif top == 'odm_head':
            _synth_odm(put, path[1:], v, 'odm_head.')
        elif top == 'align_conv':
            m = re.match(r'align_proj_(\d+)', path[1])
            kkin, o = v.shape
            cin = kkin // 9
            w = v.reshape(3, 3, cin, o).transpose(3, 2, 0, 1)
            put(f'align_conv.ac.{m.group(1)}.deform_conv.weight',
                np.ascontiguousarray(w))
        elif top.startswith('feat_refine_'):
            i = top.split('_')[-1]
            field = 'weight' if path[2] == 'kernel' else 'bias'
            val = _inv_conv(v) if path[2] == 'kernel' else v
            put(f'feat_refine_module.{i}.{path[1]}.{field}', val)
        elif top.startswith('refine_head_'):
            i = top.split('_')[-1]
            _synth_retina(put, path[1:], v, f'refine_head.{i}.')
        elif top == 'rpn_head':
            field = 'weight' if path[2] == 'kernel' else 'bias'
            val = _inv_conv(v) if path[2] == 'kernel' else v
            put(f'rpn_head.{path[1]}.{field}', val)
        elif top == 'roi_head':
            if path[1] == 'bbox_head':
                _synth_convfc(put, path[2:], v, 'roi_head.bbox_head.')
            else:
                m = re.match(r'bbox_head_(\d+)', path[1])
                _synth_convfc(put, path[2:], v,
                              f'roi_head.bbox_head.{m.group(1)}.')
        else:
            raise ValueError(f'synthesize: unhandled path {path}')

    for path, v in _walk(stats.get('backbone', {})):
        key = _resnet_torch_name(path[:-1])
        field = {'mean': 'running_mean', 'var': 'running_var'}[path[-1]]
        put(f'backbone.{key}.{field}', v)
    return out


def _resnet_torch_name(path):
    name = path[0]
    m = re.match(r'layer(\d+)_(\d+)', name)
    if not m:
        return '.'.join(path)
    rest = path[1:]
    sub = rest[0] if rest else ''
    sub = {'downsample_conv': 'downsample.0',
           'downsample_bn': 'downsample.1'}.get(sub, sub)
    return f'layer{m.group(1)}.{m.group(2)}' + (f'.{sub}' if sub else '')


def _synth_resnet(put, path, v, prefix):
    leaf = path[-1]
    base = _resnet_torch_name(path[:-1])
    if leaf == 'kernel':
        put(prefix + base + '.weight', _inv_conv(v))
    elif leaf == 'scale':
        put(prefix + base + '.weight', v)
    else:
        put(prefix + base + '.bias', v)


def _synth_fpn(put, path, v, prefix, n_lateral):
    m = re.match(r'lateral_(\d+)', path[0])
    f = re.match(r'fpn_(\d+)', path[0])
    e = re.match(r'extra_(\d+)', path[0])
    field = 'weight' if path[1] == 'kernel' else 'bias'
    val = _inv_conv(v) if path[1] == 'kernel' else v
    if m:
        put(f'{prefix}lateral_convs.{m.group(1)}.conv.{field}', val)
    elif e:
        # mmdet stores extra convs in fpn_convs past the lateral count
        put(f'{prefix}fpn_convs.{n_lateral + int(e.group(1))}'
            f'.conv.{field}', val)
    else:
        put(f'{prefix}fpn_convs.{f.group(1)}.conv.{field}', val)


_RETINA_OUT = {'cls_out': 'retina_cls', 'reg_out': 'retina_reg',
               'odm_cls': 'odm_cls', 'odm_reg': 'odm_reg'}


def _synth_retina(put, path, v, prefix):
    name = path[0]
    field = 'weight' if path[1] == 'kernel' else 'bias'
    val = _inv_conv(v) if path[1] == 'kernel' else v
    m = re.match(r'(cls|reg)_conv_(\d+)', name)
    if m:
        put(f'{prefix}{m.group(1)}_convs.{m.group(2)}.conv.{field}', val)
    else:
        put(f'{prefix}{_RETINA_OUT[name]}.{field}', val)


def _synth_convfc(put, path, v, prefix):
    name = path[0]
    field = 'weight' if path[1] == 'kernel' else 'bias'
    val = convert_linear(v) if path[1] == 'kernel' else v
    m = re.match(r'shared_fc_(\d+)', name)
    if m:
        put(f'{prefix}shared_fcs.{m.group(1)}.{field}', val)
    else:
        put(f'{prefix}{name}.{field}', val)


def _synth_fcos(put, path, v, prefix, num_levels):
    name = path[0]
    m = re.match(r'(cls|reg)_conv_(\d+)', name)
    g = re.match(r'(cls|reg)_gn_(\d+)', name)
    s = re.match(r'scale_(\d+)$', name)
    sa = re.match(r'scale_angle_(\d+)$', name)
    if m:
        field = 'weight' if path[1] == 'kernel' else 'bias'
        val = _inv_conv(v) if path[1] == 'kernel' else v
        put(f'{prefix}{m.group(1)}_convs.{m.group(2)}.conv.{field}', val)
    elif g:
        field = 'weight' if path[1] == 'scale' else 'bias'
        put(f'{prefix}{g.group(1)}_convs.{g.group(2)}.gn.{field}', v)
    elif s:
        put(f'{prefix}scales.{s.group(1)}.scale', v.reshape(1))
    elif sa:
        # ours is per-level; the reference has one shared scale_angle
        put(f'{prefix}scale_angle.scale', v.reshape(1))
    else:
        field = 'weight' if path[1] == 'kernel' else 'bias'
        val = _inv_conv(v) if path[1] == 'kernel' else v
        put(f'{prefix}{name}.{field}', val)


def _synth_odm(put, path, v, prefix):
    name = path[0]
    if name == 'or_conv':
        if path[1] == 'kernel':
            kk, i, n, o = v.shape
            w = v.reshape(3, 3, i, n, o).transpose(4, 2, 3, 0, 1)
            put(prefix + 'or_conv.weight', np.ascontiguousarray(w))
        else:
            put(prefix + 'or_conv.bias', v)
    else:
        _synth_retina(put, path, v, prefix)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('checkpoint')
    p.add_argument('out')
    p.add_argument('--type', default='RotatedRetinaNet',
                   help=f'detector type; one of {sorted(ASSEMBLERS)}')
    args = p.parse_args()
    import torch
    from flax import serialization
    ckpt = torch.load(args.checkpoint, map_location='cpu',
                      weights_only=False)
    state = ckpt.get('state_dict', ckpt)
    state = {k: v.numpy() if hasattr(v, 'numpy') else v
             for k, v in state.items()}
    variables, leftovers = convert_checkpoint(state, args.type)
    if leftovers:
        print(f'WARNING: {len(leftovers)} unmapped source keys:')
        for k in leftovers:
            print('  ', k)
    with open(args.out, 'wb') as f:
        f.write(serialization.to_bytes(variables))
    n = sum(v.size for _, v in _walk(variables['params']))
    print(f'converted {n} params -> {args.out}')


if __name__ == '__main__':
    main()
