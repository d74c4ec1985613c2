"""Single-image demo (reference ``demo/image_demo.py:28-40``)."""

import argparse
import os.path as osp
import sys

try:  # prefer the installed package; fall back to the checkout
    import orientedobjectdetection_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('img')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--out-file', default='demo_out.png')
    p.add_argument('--score-thr', type=float, default=0.3)
    args = p.parse_args()

    from orientedobjectdetection_tpu.apis.inference import (
        inference_detector, init_detector)
    from orientedobjectdetection_tpu.core.visualization import \
        imshow_det_rbboxes

    bundle = init_detector(args.config, args.checkpoint)
    result = inference_detector(bundle, args.img)
    imshow_det_rbboxes(args.img, result, score_thr=args.score_thr,
                       out_file=args.out_file)
    print(f'wrote {args.out_file}')


if __name__ == '__main__':
    main()
