"""Opt-in TPU smoke test (``pytest tests/test_tpu --runtpu``).

The fast tier pins ``JAX_PLATFORMS=cpu`` (tests/conftest.py) for CI
portability, which means platform-specific regressions (Mosaic lowering,
axon dispatch behavior) are otherwise only caught by training runs. This
drives the two north-star kernels — pairwise rotated IoU and rotated NMS —
on the real chip via a subprocess (the in-process backend is already pinned
to CPU) and checks numerical agreement with the CPU run.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), '..', '..')

_PROBE = """
import json, sys
sys.path.insert(0, %r)
import jax, jax.numpy as jnp
import numpy as np
from orientedobjectdetection_tpu.ops.iou import box_iou_rotated
from orientedobjectdetection_tpu.ops.nms import nms_rotated

rng = np.random.RandomState(0)
n = 256
boxes = np.concatenate([rng.uniform(0, 512, (n, 2)),
                        rng.uniform(8, 96, (n, 2)),
                        rng.uniform(-1.5, 1.5, (n, 1))], -1).astype('float32')
scores = rng.uniform(size=n).astype('float32')
iou = jax.jit(box_iou_rotated)(jnp.asarray(boxes), jnp.asarray(boxes))
keep, idx = jax.jit(lambda b, s: nms_rotated(b, s, 0.1))(
    jnp.asarray(boxes), jnp.asarray(scores))
print(json.dumps({
    'platform': jax.devices()[0].platform,
    'iou_sum': float(jnp.sum(iou)),
    'iou_max_offdiag': float(jnp.max(iou - jnp.eye(n))),
    'keep': np.asarray(keep).astype(int).tolist(),
}))
"""


def _run(platform_env):
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    env.update(platform_env)
    out = subprocess.run([sys.executable, '-c', _PROBE % REPO],
                         capture_output=True, text=True, timeout=900,
                         env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.tpu
def test_tpu_kernels_match_cpu():
    cpu = _run({'JAX_PLATFORMS': 'cpu'})
    tpu = _run({})  # default platform resolution picks the axon TPU
    assert cpu['platform'] == 'cpu'
    assert tpu['platform'] != 'cpu', 'no TPU visible — nothing smoked'
    # IoU matrix agreement (bf16-free f32 kernels; Pallas vs jnp lowering)
    assert abs(tpu['iou_sum'] - cpu['iou_sum']) / max(cpu['iou_sum'], 1) < 1e-3
    assert abs(tpu['iou_max_offdiag'] - cpu['iou_max_offdiag']) < 1e-3
    # greedy NMS keep set is discrete: must match exactly
    assert tpu['keep'] == cpu['keep']
