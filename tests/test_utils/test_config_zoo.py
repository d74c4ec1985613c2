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


def _collect_types(node, path=''):
    """Every dict with a 'type' key anywhere in the model config."""
    found = []
    if isinstance(node, dict):
        if 'type' in node and isinstance(node['type'], str):
            found.append((path, node['type']))
        for k, v in node.items():
            found.extend(_collect_types(v, f'{path}.{k}'))
    elif isinstance(node, (list, tuple)):
        for i, v in enumerate(node):
            found.extend(_collect_types(v, f'{path}[{i}]'))
    return found


# keys whose 'type' names are plain strings consumed structurally, not
# registry entries (optimizers, schedules, norm/init shorthands, ops)
_NON_REGISTRY_PATH = ('norm_cfg', 'init_cfg', 'act_cfg', 'conv_cfg',
                      'roi_layer', 'nms')

# type names the modules consume structurally (cfg parsed in-place, no
# registry round-trip). A TYPO in a config is caught because it appears in
# neither a registry nor this list.
_STRUCTURAL_TYPES = {
    'AlignConv',                  # S2ANet align_cfgs selector
    'AnchorGenerator',            # HBB RPN priors (built in-head)
    'DistancePointBBoxCoder',     # FCOS h_bbox_coder
    'RBboxOverlaps2D',            # assigner iou_calculator
    'RandomSampler',              # RPN sampler (built in assigner logic)
    'RotatedSingleRoIExtractor',  # roi extractor cfg parsed by roi heads
    'SingleRoIExtractor',
}


@pytest.mark.parametrize('cfg_name', ALL_CONFIGS)
def test_config_loads_and_builds(cfg_name):
    import orientedobjectdetection_tpu.core      # noqa: F401 (registers)
    import orientedobjectdetection_tpu.datasets  # noqa: F401
    from orientedobjectdetection_tpu.models import build_detector
    from orientedobjectdetection_tpu.utils import Config
    from orientedobjectdetection_tpu.utils import registry as R
    cfg = Config.fromfile(osp.join(CFG_DIR, cfg_name))
    assert 'model' in cfg, cfg_name
    det = build_detector(dict(cfg.model))
    assert det is not None
    # every registry name anywhere in the model tree must resolve — this
    # covers stage-arg heads (S2ANet/R3Det) whose modules are only built
    # inside the traced forward, where a typo would otherwise hide
    registries = [R.BACKBONES, R.NECKS, R.HEADS, R.LOSSES, R.DETECTORS,
                  R.ROI_EXTRACTORS, R.BBOX_CODERS, R.BBOX_ASSIGNERS,
                  R.BBOX_SAMPLERS, R.IOU_CALCULATORS, R.PRIOR_GENERATORS]

    def resolves(name):
        for r in registries:
            try:
                r.get(name)
                return True
            except KeyError:
                pass
        return False

    for path, name in _collect_types(dict(cfg.model)):
        leaf_key = path.rsplit('.', 1)[-1].split('[')[0]
        if leaf_key in _NON_REGISTRY_PATH:
            continue
        assert name in _STRUCTURAL_TYPES or resolves(name), \
            f'{cfg_name}: unregistered type {name!r} at {path}'
