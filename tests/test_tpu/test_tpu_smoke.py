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
import json, os, sys
sys.path.insert(0, %r)
import jax, jax.numpy as jnp
# This image's axon plugin force-sets jax_platforms='axon,cpu' from
# sitecustomize, overriding the JAX_PLATFORMS env var — pin the config
# flag programmatically (same workaround as tests/conftest.py).
if os.environ.get('OODTPU_PROBE_PLATFORM'):
    jax.config.update('jax_platforms', os.environ['OODTPU_PROBE_PLATFORM'])
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


def _run(platform, probe=None):
    """Run a probe subprocess pinned to `platform` ('cpu' or None for the
    default axon TPU). JAX_PLATFORMS in env is NOT enough: the axon
    sitecustomize overrides it, so probes re-pin via jax.config (see
    OODTPU_PROBE_PLATFORM handling in the probe source)."""
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    env.pop('OODTPU_PROBE_PLATFORM', None)
    if platform:
        env['OODTPU_PROBE_PLATFORM'] = platform
    out = subprocess.run([sys.executable, '-c', (probe or _PROBE) % REPO],
                         capture_output=True, text=True, timeout=900,
                         env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


_DECODE_PROBE = """
import json, os, sys
sys.path.insert(0, %r)
import jax, jax.numpy as jnp
if os.environ.get('OODTPU_PROBE_PLATFORM'):
    jax.config.update('jax_platforms', os.environ['OODTPU_PROBE_PLATFORM'])
import numpy as np
from orientedobjectdetection_tpu.ops.nms import multiclass_nms_rotated

rng = np.random.RandomState(1)
n, c = 8192, 15
boxes = np.concatenate([rng.uniform(0, 1024, (n, 2)),
                        rng.uniform(8, 96, (n, 2)),
                        rng.uniform(-1.5, 1.5, (n, 1))], -1).astype('float32')
scores = rng.uniform(size=(n, c + 1)).astype('float32') ** 4

dets, labels, valid = jax.jit(
    lambda b, s: multiclass_nms_rotated(b, s, 0.05, 0.1, 200,
                                        max_candidates=2000))(
    jnp.asarray(boxes), jnp.asarray(scores))
k = int(np.asarray(valid).sum())
print(json.dumps({
    'platform': jax.devices()[0].platform,
    'n_valid': k,
    'score_sum': float(jnp.where(valid, dets[:, 5], 0).sum()),
    'labels': np.asarray(labels)[:50].astype(int).tolist(),
}))
"""


@pytest.mark.tpu
def test_decode_topk_parity_tpu_vs_cpu():
    """Candidate selection parity (VERDICT r3 item 2): with the exact-top-k
    default, the TPU multiclass decode path (which previously routed
    through approx_max_k at recall 0.95) must select the same candidates
    and survivors as the CPU path."""
    cpu = _run('cpu', probe=_DECODE_PROBE)
    tpu = _run(None, probe=_DECODE_PROBE)
    assert tpu['platform'] != 'cpu'
    assert tpu['n_valid'] == cpu['n_valid']
    assert tpu['labels'] == cpu['labels']
    np.testing.assert_allclose(tpu['score_sum'], cpu['score_sum'],
                               rtol=1e-5)


@pytest.mark.tpu
def test_tpu_kernels_match_cpu():
    cpu = _run('cpu')
    tpu = _run(None)  # default platform resolution picks the axon TPU
    assert cpu['platform'] == 'cpu'
    assert tpu['platform'] != 'cpu', 'no TPU visible — nothing smoked'
    # IoU matrix agreement (bf16-free f32 kernels; Pallas vs jnp lowering)
    assert abs(tpu['iou_sum'] - cpu['iou_sum']) / max(cpu['iou_sum'], 1) < 1e-3
    assert abs(tpu['iou_max_offdiag'] - cpu['iou_max_offdiag']) < 1e-3
    # greedy NMS keep set is discrete: must match exactly
    assert tpu['keep'] == cpu['keep']
