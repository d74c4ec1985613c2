"""Config system tests (_base_ inheritance, _delete_, merge_from_dict)."""

import os.path as osp
import tempfile

from orientedobjectdetection_tpu.utils import Config

CFG_DIR = osp.join(osp.dirname(__file__), '..', '..', 'configs')


def test_base_inheritance():
    cfg = Config.fromfile(osp.join(
        CFG_DIR,
        'rotated_retinanet/rotated_retinanet_obb_r50_fpn_1x_dota_le90.py'))
    # from the leaf
    assert cfg.model.type == 'RotatedRetinaNet'
    # from _base_/schedules
    assert cfg.optimizer.type == 'sgd'
    assert cfg.runner.max_epochs == 12
    # from _base_/datasets
    assert cfg.data.train.type == 'DOTADataset'


def test_delete_key():
    with tempfile.TemporaryDirectory() as d:
        base = osp.join(d, 'base.py')
        child = osp.join(d, 'child.py')
        with open(base, 'w') as f:
            f.write("model = dict(a=dict(x=1, y=2), b=3)\n")
        with open(child, 'w') as f:
            f.write("_base_ = ['./base.py']\n"
                    "model = dict(a=dict(_delete_=True, z=9))\n")
        cfg = Config.fromfile(child)
        assert dict(cfg.model.a) == {'z': 9}
        assert cfg.model.b == 3


def test_merge_from_dict():
    cfg = Config(dict(model=dict(head=dict(num_classes=15)), lr=0.01))
    cfg.merge_from_dict({'model.head.num_classes': 3, 'lr': 0.1})
    assert cfg.model.head.num_classes == 3
    assert cfg.lr == 0.1


def test_tiny_synth_overrides():
    cfg = Config.fromfile(osp.join(
        CFG_DIR, 'rotated_retinanet/rotated_retinanet_tiny_synth.py'))
    assert cfg.model.backbone.depth == 18
    assert cfg.model.bbox_head.num_classes == 2
    # _delete_ replaced the dataset subtree
    assert 'version' in cfg.data.train
