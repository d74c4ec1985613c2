"""Minimal repro: resident jit-constant bytes tax every later dispatch.

On this TPU platform, once an executable with large embedded constants is
loaded (weights closed over instead of passed as arguments), every
subsequent `execute` call of ANY executable pays a fixed latency penalty
roughly proportional to resident program bytes. Run on a TPU host:

    python tools/analysis_tools/dispatch_tax_repro.py

Expected output shape (v5e, jax 0.8.x):

    triv baseline                 0.03 ms
    triv after fwd(vars-as-arg)   0.03 ms   <- no tax
    triv after fwd(vars-as-const) ~1.0 ms   <- ~30-50x tax

The fix is structural, not a flag: pass the params pytree as a jit
ARGUMENT. See README "Params are jit arguments, never closures".
"""

import time

import jax
import jax.numpy as jnp
from flax import linen as nn


def timed(name, jf, *args, iters=30):
    out = jf(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jf(*args)
    jax.block_until_ready(out)
    print(f'{name:32s} {(time.perf_counter() - t0) / iters * 1e3:.3f} ms')


class Tower(nn.Module):
    """Enough conv weight to make the constants big (~70 MB fp32)."""

    @nn.compact
    def __call__(self, x):
        for i in range(20):
            x = nn.Conv(128, (3, 3), name=f'conv{i}')(x)
            x = nn.relu(x)
        return x.sum()


def main():
    triv = jax.jit(lambda x: (x * 2 + 1).sum())
    x = jnp.ones((256, 256), jnp.float32)
    timed('triv baseline', triv, x)

    model = Tower()
    img = jnp.ones((4, 256, 256, 128), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img[:1])
    jax.block_until_ready(variables)

    fwd_arg = jax.jit(model.apply)
    jax.block_until_ready(fwd_arg(variables, img))
    timed('triv after fwd(vars-as-arg)', triv, x)

    fwd_const = jax.jit(lambda im: model.apply(variables, im))
    jax.block_until_ready(fwd_const(img))
    timed('triv after fwd(vars-as-const)', triv, x)


if __name__ == '__main__':
    main()
