"""Benchmark: single-chip throughput on the flagship Rotated RetinaNet R50.

Three measurements (BASELINE.json asks for all three):
- end-to-end inference imgs/s at 1024x1024 bf16 batch 8, including decode +
  rotated NMS (the reference's fps protocol,
  ``tools/analysis_tools/benchmark.py``);
- train-step imgs/s (forward + loss + backward + SGD update, batch 4);
- standalone rotated-NMS throughput in Mboxes/s at 2000 candidates, plus
  the NMS+decode share of the e2e inference latency.

Baseline: 16.9 fps — Rotated RetinaNet OBB R50 le90 on a GTX 1080 Ti
(BASELINE.md / configs/rotated_retinanet/README.md:20).

Prints ONE JSON line; the headline metric is e2e inference imgs/s and the
other measurements ride in the same object.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_FPS = 16.9
BATCH = 8
TRAIN_BATCH = 2
WARMUP = 3
ITERS = 10


def _timed(fn, *args, iters=ITERS, warmup=WARMUP):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from __graft_entry__ import _retina_cfg
    from orientedobjectdetection_tpu.models import build_detector
    from orientedobjectdetection_tpu.ops.nms import nms_rotated

    rng = jax.random.PRNGKey(0)

    # ---- standalone rotated NMS kernel (FIRST: measured on a clean
    # device — with model weights/activations resident, per-call latency on
    # this platform degrades ~50x and would measure allocator state, not
    # the kernel; the in-model NMS cost is captured separately by
    # nms_decode_share_of_e2e below) ---------------------------------------
    n = 2000
    k1, k2 = jax.random.split(rng)
    nms_boxes = jnp.concatenate([
        jax.random.uniform(k1, (n, 2)) * 1024,
        jax.random.uniform(k2, (n, 2)) * 60 + 4,
        (jax.random.uniform(k1, (n, 1)) - 0.5) * 3,
    ], -1)
    nms_scores = jax.random.uniform(k2, (n,))

    @jax.jit
    def run_nms(boxes, scores):
        return nms_rotated(boxes, scores, 0.1)[0]

    t_nms = _timed(run_nms, nms_boxes, nms_scores, iters=30)
    mboxes = n / t_nms / 1e6

    det = build_detector(_retina_cfg(), dtype=jnp.bfloat16)
    images = jax.random.normal(rng, (BATCH, 1024, 1024, 3), jnp.bfloat16)
    variables = jax.jit(det.init)(rng, images[:1])

    # ---- e2e inference (backbone/neck/head + decode + NMS) ---------------
    @jax.jit
    def infer(images):
        outputs = det.apply(variables, images)
        outputs = jax.tree.map(lambda x: x.astype(jnp.float32), outputs)
        return det.bboxes_from_outputs(outputs)

    t_infer = _timed(infer, images)
    fps = BATCH / t_infer

    # ---- network-only forward (to split out the decode+NMS share) --------
    @jax.jit
    def forward_only(images):
        return det.apply(variables, images)

    t_fwd = _timed(forward_only, images)
    nms_share = max(0.0, 1.0 - t_fwd / t_infer)

    # ---- train step -------------------------------------------------------
    import optax
    from orientedobjectdetection_tpu.parallel.train_state import (
        TrainState, make_train_step)
    tx = optax.sgd(0.0025, momentum=0.9)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables['params'],
                       batch_stats=variables.get('batch_stats', {}),
                       opt_state=tx.init(variables['params']))
    g = 32
    tb = dict(
        images=images[:TRAIN_BATCH].astype(jnp.bfloat16),
        gt_bboxes=jnp.tile(jnp.asarray([[300., 300., 80., 40., 0.4]]),
                           (TRAIN_BATCH, g, 1)),
        gt_labels=jnp.zeros((TRAIN_BATCH, g), jnp.int32),
        gt_mask=jnp.zeros((TRAIN_BATCH, g), bool).at[:, :8].set(True))
    step_fn = jax.jit(make_train_step(det, tx), donate_argnums=0)

    def train_once(tb):
        nonlocal state
        state, m = step_fn(state, tb)
        return m['loss']

    t_train = _timed(train_once, tb, iters=5, warmup=2)
    train_ips = TRAIN_BATCH / t_train

    print(json.dumps({
        'metric': 'retinanet_r50_1024_infer_imgs_per_sec',
        'value': round(fps, 2),
        'unit': 'imgs/s/chip',
        'vs_baseline': round(fps / BASELINE_FPS, 2),
        'train_imgs_per_sec': round(train_ips, 2),
        'nms_rotated_mboxes_per_sec': round(mboxes, 3),
        'nms_decode_share_of_e2e': round(nms_share, 3),
    }))


if __name__ == '__main__':
    main()
