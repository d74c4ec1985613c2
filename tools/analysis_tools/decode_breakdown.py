"""Attribute the e2e decode+NMS share (bench.py ``nms_decode_share_of_e2e``)
to its sub-stages, at the flagship shape (R50 1024^2 batch 8, 15 classes).

The share is measured e2e as ``1 - t_forward/t_infer``; this tool times the
decode path's building blocks standalone (same timing protocol as bench.py:
drain queue, enqueue K iters, await last output) so optimization effort
lands on the actual hot stage rather than the assumed one:

- ``topk_level``: exact ``lax.top_k`` over the stride-8 level's max-class
  scores, batch 8 x 147456 -> 2000 (the biggest per-level selection;
  reference ``rotated_anchor_head.py:514-690`` does the same per level).
- ``gather_decode``: the candidate gather + one-hot einsum + sigmoid +
  delta decode for those 2000 candidates (per level-0 shapes).
- ``topk_multiclass``: the (10000 candidates x 15 classes) -> 2000
  selection inside ``multiclass_nms_rotated``.
- ``nms_classmajor``: ``nms_rotated`` at N=2000 with class-major ids, the
  production configuration (Pallas pair-mask kernel + class tile skip).
- ``get_bboxes``: the whole decode path (everything after the network),
  for cross-checking that the stages sum to the e2e share.

Run on the real chip (no args); prints one JSON object.
"""

import json
import os.path as osp
import sys
import time

import numpy as np

try:  # prefer the installed package; fall back to the checkout
    import orientedobjectdetection_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..'))

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/oodtpu_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

B, HW, A, C, K, NCAND = 8, 128 * 128, 9, 15, 2000, 10000


def _await(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def timed(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _await(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _await(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = jax.random.PRNGKey(0)
    out = {}

    # ---- per-level exact top-k (level 0 dominates: 147k rows) -----------
    logits = jax.random.normal(rng, (B, HW * A), jnp.float32)

    @jax.jit
    def topk_level(m):
        return jax.lax.top_k(m, K)

    out['topk_level_ms'] = timed(topk_level, logits) * 1e3

    # ---- candidate gather + decode for the selected 2000 ----------------
    full_logits = jax.random.normal(rng, (B, HW, A * C), jnp.bfloat16)
    deltas = jax.random.normal(rng, (B, HW, A * 5), jnp.bfloat16)
    anchors = jnp.concatenate([
        jax.random.uniform(rng, (HW * A, 2)) * 1024,
        jnp.full((HW * A, 2), 32.0), jnp.zeros((HW * A, 1))], -1)

    @jax.jit
    def gather_decode(logits2, deltas2):
        def per_image(lg, dl):
            m = lg.reshape(HW, A, C).max(-1).astype(jnp.float32).reshape(-1)
            v, idx = jax.lax.top_k(m, K)
            loc, sub = idx // A, idx % A
            pick = jax.nn.one_hot(sub, A, dtype=jnp.float32)
            row_l = lg.reshape(HW, A * C)[loc].astype(jnp.float32)
            sel_l = jnp.einsum('ka,kac->kc', pick, row_l.reshape(K, A, C))
            row_d = dl.reshape(HW, A * 5)[loc].astype(jnp.float32)
            sel_d = jnp.einsum('ka,kae->ke', pick, row_d.reshape(K, A, 5))
            row_a = anchors.reshape(HW, A * 5)[loc]
            sel_a = jnp.einsum('ka,kae->ke', pick, row_a.reshape(K, A, 5))
            return jax.nn.sigmoid(sel_l), sel_d + sel_a
        return jax.vmap(per_image)(logits2, deltas2)

    out['gather_decode_ms'] = timed(gather_decode, full_logits, deltas) * 1e3

    # ---- multiclass candidate cap: (10000*15,) -> 2000 ------------------
    mscores = jax.random.uniform(rng, (B, NCAND * C), jnp.float32)

    @jax.jit
    def topk_multiclass(s):
        return jax.lax.top_k(s, K)

    out['topk_multiclass_ms'] = timed(topk_multiclass, mscores) * 1e3

    # ---- production NMS: N=2000, class-major, batched -------------------
    from orientedobjectdetection_tpu.ops.nms import nms_rotated
    k1, k2 = jax.random.split(rng)
    boxes = jnp.concatenate([
        jax.random.uniform(k1, (B, K, 2)) * 1024,
        jax.random.uniform(k2, (B, K, 2)) * 60 + 4,
        (jax.random.uniform(k1, (B, K, 1)) - 0.5) * 3], -1)
    cls = jnp.sort(jax.random.randint(k2, (B, K), 0, C), -1)
    # class offsets, as multiclass_nms_rotated applies them
    boxes = boxes.at[..., :2].add(cls[..., None] * 1100.0)
    scores = jax.random.uniform(k2, (B, K))

    @jax.jit
    def nms_classmajor(b, s, c):
        return jax.vmap(lambda bb, ss, cc: nms_rotated(
            bb, ss, 0.1, class_ids=cc))(b, s, c)

    out['nms_classmajor_ms'] = timed(nms_classmajor, boxes, scores, cls) * 1e3

    @jax.jit
    def nms_noclass(b, s):
        return jax.vmap(lambda bb, ss: nms_rotated(bb, ss, 0.1))(b, s)

    out['nms_noclass_ms'] = timed(nms_noclass, boxes, scores) * 1e3

    # ---- whole decode path on a real head, vs forward-only --------------
    from __graft_entry__ import _retina_cfg
    from orientedobjectdetection_tpu.models import build_detector
    det = build_detector(_retina_cfg(), dtype=jnp.bfloat16)
    images = jax.random.normal(rng, (B, 1024, 1024, 3), jnp.bfloat16)
    variables = jax.jit(det.init)(rng, images[:1])

    fwd = jax.jit(lambda v, im: det.apply(v, im))
    outputs = jax.tree.map(jnp.copy, fwd(variables, images))
    decode = jax.jit(lambda o: det.bboxes_from_outputs(o))
    out['forward_only_ms'] = timed(fwd, variables, images) * 1e3
    out['decode_only_ms'] = timed(decode, outputs) * 1e3

    print(json.dumps({k: round(v, 3) for k, v in out.items()}))


if __name__ == '__main__':
    main()
