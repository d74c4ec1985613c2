"""End-to-end mAP proof on generated data (VERDICT.md round-1 item #1).

No DOTA imagery ships in this environment, so detection quality is proved by
training ``configs/rotated_retinanet/rotated_retinanet_tiny_synth.py`` on the
synthetic DOTA-format dataset (``tools/data/synth/generate_synth.py``) to
convergence and asserting train-set mAP > 0.9 at IoU 0.5 — the full stack:
loader -> pipeline -> anchor assign -> loss -> jitted sharded step -> decode
-> rotated NMS -> ``eval_rbbox_map``.  A random-weights detector scores ~0
on the same protocol (asserted below), so the bar is meaningful.

Reference analog: the model-zoo mAP tables
(``/root/reference/configs/rotated_retinanet/README.md:19-23``) — the number
that says the detector actually detects.  Marked slow: minutes on TPU,
tens of minutes on CPU CI.
"""

import os.path as osp
import sys

import numpy as np
import pytest

REPO = osp.join(osp.dirname(__file__), '..', '..')
sys.path.insert(0, REPO)
sys.path.insert(0, osp.join(REPO, 'tools', 'data', 'synth'))

CONFIGS = {
    'retinanet': ('rotated_retinanet', 'rotated_retinanet_tiny_synth.py'),
    'oriented_rcnn': ('oriented_rcnn', 'oriented_rcnn_tiny_synth.py'),
    'rotated_yolov8': ('jy', 'rotated_yolov8_tiny_synth.py'),
    'redet': ('redet', 'redet_tiny_synth.py'),
    'oriented_reppoints': ('oriented_reppoints',
                           'oriented_reppoints_tiny_synth.py'),
    's2anet': ('s2anet', 's2anet_tiny_synth.py'),
    'r3det': ('r3det', 'r3det_tiny_synth.py'),
    'gliding_vertex': ('gliding_vertex', 'gliding_vertex_tiny_synth.py'),
    'rotated_fcos': ('rotated_fcos', 'rotated_fcos_tiny_synth.py'),
    'gwd': ('gwd', 'gwd_tiny_synth.py'),
    'kld': ('kld', 'kld_tiny_synth.py'),
    'kfiou': ('kfiou', 'kfiou_tiny_synth.py'),
    'csl': ('csl', 'csl_tiny_synth.py'),
    'rotated_faster_rcnn': ('rotated_faster_rcnn',
                            'rotated_faster_rcnn_tiny_synth.py'),
    'roi_trans': ('roi_trans', 'roi_trans_tiny_synth.py'),
    'cfa': ('cfa', 'cfa_tiny_synth.py'),
    'sasm': ('sasm_reppoints', 'sasm_tiny_synth.py'),
    'g_reppoints': ('g_reppoints', 'g_reppoints_tiny_synth.py'),
}


def _make_cfg(root, family='retinanet', max_gt=16):
    from orientedobjectdetection_tpu.utils import Config
    d, f = CONFIGS[family]
    cfg = Config.fromfile(osp.join(REPO, 'configs', d, f))
    for split in ('train', 'val', 'test'):
        cfg.data[split]['ann_file'] = osp.join(root, 'trainval', 'annfiles')
        cfg.data[split]['img_prefix'] = osp.join(root, 'trainval', 'images')
    return cfg


@pytest.mark.slow
@pytest.mark.parametrize('family', list(CONFIGS))
def test_synth_convergence(tmp_path, family):
    from generate_synth import generate_synth
    from orientedobjectdetection_tpu.apis.eval import batched_eval
    from orientedobjectdetection_tpu.apis.inference import DetectorBundle
    from orientedobjectdetection_tpu.apis.train import train_detector
    from orientedobjectdetection_tpu.datasets import build_dataset

    root = str(tmp_path / 'synth')
    generate_synth(root, num_images=64, size=256, seed=0)
    cfg = _make_cfg(root, family)
    cfg.data['samples_per_gpu'] = 4
    work_dir = str(tmp_path / 'wd')

    state = train_detector(cfg, work_dir, max_steps=600, log_interval=100)

    variables = {'params': state.params}
    if getattr(state, 'batch_stats', None):
        variables['batch_stats'] = state.batch_stats
    from orientedobjectdetection_tpu.models import build_detector
    detector = build_detector(dict(cfg.model))
    bundle = DetectorBundle(cfg, detector, variables)
    dataset = build_dataset(dict(cfg.data['val'], test_mode=True,
                                 filter_empty_gt=False))
    results = batched_eval(bundle, dataset, batch_size=4)
    metrics = dataset.evaluate(results, metric='mAP', iou_thr=0.5)
    assert metrics['mAP'] > 0.9, metrics

    # the same protocol with random weights scores ~0 -> the bar above is
    # measuring real detection, not an artifact of the eval path
    import jax
    rand_vars = jax.jit(detector.init)(
        jax.random.PRNGKey(1),
        np.zeros((1, 256, 256, 3), np.float32))
    rand_bundle = DetectorBundle(cfg, detector, rand_vars)
    rand = batched_eval(rand_bundle, dataset, batch_size=4)
    rand_metrics = dataset.evaluate(rand, metric='mAP', iou_thr=0.5)
    assert rand_metrics['mAP'] < 0.3, rand_metrics
