"""Benchmark: end-to-end single-chip inference throughput (imgs/sec).

Mirrors the reference's ``tools/analysis_tools/benchmark.py`` protocol
(pure-forward fps, warmup then timed steady state) on the flagship
Rotated RetinaNet R50 at 1024x1024, bf16, batch 8, *including* box decode +
rotated NMS (the reference's fps likewise includes its get_bboxes path).

Baseline: 16.9 fps — Rotated RetinaNet OBB R50 le90 on a GTX 1080 Ti
(BASELINE.md / configs/rotated_retinanet/README.md:20).

Prints ONE JSON line.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_FPS = 16.9
BATCH = 8
WARMUP = 3
ITERS = 10


def main():
    from __graft_entry__ import _retina_cfg
    from orientedobjectdetection_tpu.models import build_detector

    det = build_detector(_retina_cfg(), dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (BATCH, 1024, 1024, 3), jnp.bfloat16)
    variables = jax.jit(det.init)(rng, images[:1])

    @jax.jit
    def infer(images):
        outputs = det.apply(variables, images)
        outputs = jax.tree.map(lambda x: x.astype(jnp.float32), outputs)
        return det.bboxes_from_outputs(outputs)

    # compile + warmup
    for _ in range(WARMUP):
        dets, labels, valid = infer(images)
    jax.block_until_ready(dets)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        dets, labels, valid = infer(images)
    jax.block_until_ready(dets)
    dt = time.perf_counter() - t0

    fps = BATCH * ITERS / dt
    print(json.dumps({
        'metric': 'retinanet_r50_1024_infer_imgs_per_sec',
        'value': round(fps, 2),
        'unit': 'imgs/s/chip',
        'vs_baseline': round(fps / BASELINE_FPS, 2),
    }))


if __name__ == '__main__':
    main()
