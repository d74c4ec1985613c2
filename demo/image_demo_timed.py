"""Timed single-image demo (reference ``demo/image_demo_jy.py:36-88``):
reports model-load time, per-phase inference latency (first call = compile,
steady-state = execution) and device memory — the TPU analog of the
reference's CUDA VRAM/timing instrumentation.

    python demo/image_demo_timed.py <img> <config> [ckpt] --iters 20
"""

import argparse
import os.path as osp
import sys
import time

try:  # prefer the installed package; fall back to the checkout
    import orientedobjectdetection_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('img', help='image file (or "random" for a synthetic one)')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--out-file', default=None)
    p.add_argument('--score-thr', type=float, default=0.3)
    p.add_argument('--palette', default='dota',
                   choices=['dota', 'sar', 'hrsc', 'hrsc_classwise',
                            'random'])
    p.add_argument('--iters', type=int, default=20,
                   help='steady-state timing iterations')
    p.add_argument('--bf16', action='store_true')
    return p.parse_args()


def main():
    args = parse_args()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from orientedobjectdetection_tpu.apis.inference import (
        inference_detector, init_detector)

    t0 = time.perf_counter()
    bundle = init_detector(args.config, args.checkpoint,
                           dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    t_load = time.perf_counter() - t0
    print(f'model load+init: {t_load:.2f}s')

    if args.img == 'random':
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (1024, 1024, 3), np.uint8)
    else:
        import cv2
        img = cv2.imread(args.img)
        if img is None:
            raise FileNotFoundError(args.img)

    t0 = time.perf_counter()
    result = inference_detector(bundle, img)
    t_first = time.perf_counter() - t0
    print(f'first inference (XLA compile + run): {t_first:.2f}s')

    t0 = time.perf_counter()
    for _ in range(args.iters):
        result = inference_detector(bundle, img)
    t_steady = (time.perf_counter() - t0) / max(args.iters, 1)
    print(f'steady-state inference: {t_steady * 1e3:.1f} ms/img '
          f'({1.0 / t_steady:.1f} imgs/s)')

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        in_use = stats.get('bytes_in_use')
        peak = stats.get('peak_bytes_in_use')
        if in_use is not None:
            print(f'device memory: {in_use / 2**30:.2f} GiB in use'
                  + (f', {peak / 2**30:.2f} GiB peak' if peak else ''))
    except Exception:
        pass

    n_det = sum(len(r) for r in result)
    print(f'detections: {n_det}')
    if args.out_file:
        from orientedobjectdetection_tpu.core.visualization import (
            imshow_det_rbboxes)
        imshow_det_rbboxes(img, result, score_thr=args.score_thr,
                           palette=args.palette, out_file=args.out_file)
        print(f'wrote {args.out_file}')


if __name__ == '__main__':
    main()
