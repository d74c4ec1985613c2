"""Config-zoo smoke test: every config in configs/ (the reference's API
surface — BASELINE.json requires ``configs/*`` to load unchanged) must
parse through the _base_ machinery and build its detector module."""

import glob
import os.path as osp

import pytest

CFG_DIR = osp.join(osp.dirname(__file__), '..', '..', 'configs')
ALL_CONFIGS = sorted(
    osp.relpath(p, CFG_DIR)
    for p in glob.glob(osp.join(CFG_DIR, '**', '*.py'), recursive=True)
    if '_base_' not in p)


def test_zoo_is_a_superset_of_the_reference():
    # the reference ships 90 non-base configs across 22 families
    assert len(ALL_CONFIGS) >= 90, ALL_CONFIGS


@pytest.mark.parametrize('cfg_name', ALL_CONFIGS)
def test_config_loads_and_builds(cfg_name):
    from orientedobjectdetection_tpu.models import build_detector
    from orientedobjectdetection_tpu.utils import Config
    cfg = Config.fromfile(osp.join(CFG_DIR, cfg_name))
    assert 'model' in cfg, cfg_name
    det = build_detector(dict(cfg.model))
    assert det is not None
    # head/assigner/coder configs resolve (registry names exist) without
    # tracing the network (S2ANet's make_head takes stage args — skip)
    if hasattr(det, 'make_head') and type(det).make_head.__qualname__ \
            .startswith('RotatedSingleStageDetector'):
        head = det.make_head()
        for attr in ('prior_generator', 'coder'):
            getattr(head, attr, None)
