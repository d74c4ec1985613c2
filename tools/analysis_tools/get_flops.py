"""FLOPs/params counter (reference ``tools/analysis_tools/get_flops.py``).

Uses jax.jit cost analysis on the detector forward.

    python tools/analysis_tools/get_flops.py <config> --shape 1024 1024
"""
import argparse
import os.path as osp
import sys

try:  # prefer the installed package; fall back to the checkout
    import orientedobjectdetection_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--shape', type=int, nargs=2, default=[1024, 1024])
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from orientedobjectdetection_tpu.models import build_detector
    from orientedobjectdetection_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    det = build_detector(dict(cfg.model))
    rng = jax.random.PRNGKey(0)
    imgs = jnp.zeros((1, args.shape[0], args.shape[1], 3), jnp.float32)
    variables = jax.jit(det.init)(rng, imgs)
    n_params = sum(np.prod(x.shape) for x in
                   jax.tree.leaves(variables['params']))

    lowered = jax.jit(lambda v, x: det.apply(v, x)).lower(variables, imgs)
    cost = lowered.compile().cost_analysis()
    flops = cost.get('flops', float('nan')) if cost else float('nan')
    print(f'Input shape: (1, {args.shape[0]}, {args.shape[1]}, 3)')
    print(f'Params: {n_params / 1e6:.2f} M')
    print(f'FLOPs (fwd): {flops / 1e9:.2f} GFLOPs')


if __name__ == '__main__':
    main()
