"""Huge-image demo via sliding-window inference
(reference ``demo/huge_image_demo.py:60-75``)."""

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
    p.add_argument('--patch-sizes', type=int, nargs='+', default=[1024])
    p.add_argument('--patch-steps', type=int, nargs='+', default=[824])
    p.add_argument('--img-ratios', type=float, nargs='+', default=[1.0])
    p.add_argument('--merge-iou-thr', type=float, default=0.1)
    p.add_argument('--out-file', default='huge_demo_out.png')
    p.add_argument('--score-thr', type=float, default=0.3)
    args = p.parse_args()

    from orientedobjectdetection_tpu.apis.inference import (
        inference_detector_by_patches, init_detector)
    from orientedobjectdetection_tpu.core.visualization import \
        imshow_det_rbboxes

    bundle = init_detector(args.config, args.checkpoint)
    result = inference_detector_by_patches(
        bundle, args.img, sizes=args.patch_sizes, steps=args.patch_steps,
        ratios=args.img_ratios, merge_iou_thr=args.merge_iou_thr)
    imshow_det_rbboxes(args.img, result, score_thr=args.score_thr,
                       out_file=args.out_file)
    print(f'wrote {args.out_file}')


if __name__ == '__main__':
    main()
