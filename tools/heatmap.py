"""Per-channel feature heatmaps (reference jy's ``tools/heatmap_jy.py:15-40``).

    python tools/heatmap.py <config> <img> [ckpt] --out-dir heatmaps \
        [--level 0] [--reduce mean]
"""
import argparse
import os
import os.path as osp
import sys

import cv2
import numpy as np

try:  # prefer the installed package; fall back to the checkout
    import orientedobjectdetection_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('img')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--out-dir', default='heatmaps')
    p.add_argument('--level', type=int, default=0)
    p.add_argument('--reduce', default='mean', choices=['mean', 'max'])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from orientedobjectdetection_tpu.apis.inference import (_prep_image,
                                                            init_detector)
    from orientedobjectdetection_tpu.utils import Config
    from orientedobjectdetection_tpu.utils.registry import (BACKBONES,
                                                            NECKS)

    cfg = Config.fromfile(args.config)
    bundle = init_detector(cfg, args.checkpoint)
    img = _prep_image(args.img, dict(mean=[123.675, 116.28, 103.53],
                                     std=[58.395, 57.12, 57.375],
                                     to_rgb=True))
    pad = cfg.get('pad_size') or (1024, 1024)
    canvas = np.zeros((pad[0], pad[1], 3), np.float32)
    h, w = min(img.shape[0], pad[0]), min(img.shape[1], pad[1])
    canvas[:h, :w] = img[:h, :w]

    det = bundle.detector

    def feats_fn(variables, x):
        backbone = BACKBONES.build(dict(det.backbone), name='backbone')
        outs = backbone.apply(
            {'params': variables['params']['backbone'],
             'batch_stats': variables.get('batch_stats', {}).get(
                 'backbone', {})}, x)
        return outs

    feats = feats_fn(bundle.variables, jnp.asarray(canvas[None]))
    level = feats[min(args.level, len(feats) - 1)]
    fmap = np.asarray(level[0])
    heat = fmap.mean(-1) if args.reduce == 'mean' else fmap.max(-1)
    heat = (heat - heat.min()) / max(heat.max() - heat.min(), 1e-6)
    heat8 = (heat * 255).astype(np.uint8)
    color = cv2.applyColorMap(cv2.resize(heat8, (pad[1], pad[0])),
                              cv2.COLORMAP_JET)
    base = cv2.imread(args.img)
    base = cv2.resize(base, (pad[1], pad[0]))
    overlay = cv2.addWeighted(base, 0.5, color, 0.5, 0)
    os.makedirs(args.out_dir, exist_ok=True)
    out = osp.join(args.out_dir, f'heatmap_l{args.level}.png')
    cv2.imwrite(out, overlay)
    print(f'wrote {out}')


if __name__ == '__main__':
    main()
