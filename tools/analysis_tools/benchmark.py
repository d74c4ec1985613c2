"""Pure-forward fps benchmark (reference
``tools/analysis_tools/benchmark.py:62-``: 2000 iters, skip first 5).

    python tools/analysis_tools/benchmark.py <config> [ckpt] \
        --shape 1024 1024 --batch 1 --iters 200 --warmup 5 [--bf16] [--full]

``--full`` also times the decode+NMS path (get_bboxes), not just the net.
"""

import argparse
import os.path as osp
import sys
import time

try:  # prefer the installed package; fall back to the checkout
    import orientedobjectdetection_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--shape', type=int, nargs=2, default=[1024, 1024])
    p.add_argument('--batch', type=int, default=1)
    p.add_argument('--iters', type=int, default=200)
    p.add_argument('--warmup', type=int, default=5)
    p.add_argument('--bf16', action='store_true')
    p.add_argument('--full', action='store_true')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from orientedobjectdetection_tpu.apis.inference import init_detector
    from orientedobjectdetection_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    cfg['pad_size'] = tuple(args.shape)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    bundle = init_detector(cfg, args.checkpoint, dtype=dtype)
    images = jnp.zeros((args.batch, args.shape[0], args.shape[1], 3),
                       jnp.float32)

    if args.full:
        fn = jax.jit(lambda x: bundle._infer_impl(x))
    else:
        fn = jax.jit(lambda x: bundle.detector.apply(
            bundle.variables, x.astype(bundle.dtype)))

    out = fn(images)
    jax.block_until_ready(out)
    for _ in range(args.warmup):
        out = fn(images)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fn(images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = args.batch * args.iters / dt
    mode = 'full (net+decode+nms)' if args.full else 'net only'
    print(f'{mode}: {fps:.2f} imgs/s '
          f'({1000 * dt / (args.batch * args.iters):.2f} ms/img)')


if __name__ == '__main__':
    main()
