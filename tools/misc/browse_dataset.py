"""Visualize dataset samples after the train pipeline (reference
``tools/misc/browse_dataset.py``).

    python tools/misc/browse_dataset.py <config> --output-dir viz --num 8
"""
import argparse
import os
import os.path as osp
import sys

import numpy as np

try:  # prefer the installed package; fall back to the checkout
    import orientedobjectdetection_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--output-dir', default='browse_out')
    p.add_argument('--num', type=int, default=8)
    args = p.parse_args()

    from orientedobjectdetection_tpu.core.visualization import \
        imshow_det_rbboxes
    from orientedobjectdetection_tpu.datasets import build_dataset
    from orientedobjectdetection_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    dataset = build_dataset(cfg.data['train'])
    os.makedirs(args.output_dir, exist_ok=True)
    version = cfg.data['train'].get('version', 'oc')
    for i in range(min(args.num, len(dataset))):
        s = dataset[i]
        img = s['img']
        # un-normalize for display
        norm = s.get('img_norm_cfg')
        if norm is not None:
            img = img * norm['std'] + norm['mean']
            if norm.get('to_rgb'):
                img = img[..., ::-1]
        img = np.clip(img, 0, 255).astype(np.uint8)
        boxes = s.get('gt_bboxes', np.zeros((0, 5), np.float32))
        labels = s.get('gt_labels', np.zeros((0,), np.int64))
        per_cls = []
        for c in range(len(dataset.CLASSES)):
            m = labels == c
            d = np.concatenate([boxes[m], np.ones((m.sum(), 1))], -1)
            per_cls.append(d)
        imshow_det_rbboxes(img, per_cls, class_names=dataset.CLASSES,
                           score_thr=0, version=version,
                           out_file=osp.join(args.output_dir,
                                             f'sample_{i}.png'))
    print(f'wrote {min(args.num, len(dataset))} samples to '
          f'{args.output_dir}')


if __name__ == '__main__':
    main()
