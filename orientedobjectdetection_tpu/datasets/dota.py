"""DOTA / HRSC / SAR datasets.

Reimplements reference ``datasets/dota.py:24-382``, ``hrsc.py``, ``sar.py``:
DOTA ``.txt`` polygon annotations -> OBBs via the cv2-faithful
``poly2obb_np``; ``evaluate`` -> rotated VOC mAP; ``merge_det`` re-assembles
patch detections into original-image space (``__x___y`` filename offsets) and
``format_results`` writes the Task1 submission files.
"""

from __future__ import annotations

import glob
import os
import os.path as osp
import re
import tempfile
import zipfile
from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..core.eval_map import eval_rbbox_map
from ..ops.boxes import obb2poly_np, poly2obb_np
from ..utils.registry import DATASETS
from .pipelines import Compose


@DATASETS.register_module()
class DOTADataset:
    """DOTA-v1.0 (15 classes)."""

    CLASSES = ('plane', 'baseball-diamond', 'bridge', 'ground-track-field',
               'small-vehicle', 'large-vehicle', 'ship', 'tennis-court',
               'basketball-court', 'storage-tank', 'soccer-ball-field',
               'roundabout', 'harbor', 'swimming-pool', 'helicopter')

    PALETTE = [(165, 42, 42), (189, 183, 107), (0, 255, 0), (255, 0, 0),
               (138, 43, 226), (255, 128, 0), (255, 0, 255), (0, 255, 255),
               (255, 193, 193), (0, 51, 153), (255, 250, 205), (0, 139, 139),
               (255, 255, 0), (147, 116, 116), (0, 0, 255)]

    def __init__(self, ann_file: str, pipeline, img_prefix: str = '',
                 version: str = 'oc', difficulty: int = 100,
                 filter_empty_gt: bool = True, test_mode: bool = False,
                 classes=None, **kwargs):
        self.ann_file = ann_file
        self.img_prefix = img_prefix
        self.version = version
        self.difficulty = difficulty
        self.filter_empty_gt = filter_empty_gt
        self.test_mode = test_mode
        if classes is not None:
            self.CLASSES = tuple(classes)
        self.cls_map = {c: i for i, c in enumerate(self.CLASSES)}
        self.data_infos = self.load_annotations(ann_file)
        self.pipeline = Compose(pipeline)

    def __len__(self):
        return len(self.data_infos)

    def load_annotations(self, ann_folder: str) -> List[Dict]:
        """Scan ``annfiles/*.txt``; a folder of images means test mode
        (reference ``dota.py:58-113``)."""
        ann_files = sorted(glob.glob(osp.join(ann_folder, '*.txt')))
        data_infos = []
        if not ann_files:  # test split: images only
            img_files = sorted(glob.glob(osp.join(ann_folder, '*.png'))) + \
                sorted(glob.glob(osp.join(ann_folder, '*.jpg')))
            for img in img_files:
                data_infos.append(dict(
                    filename=osp.basename(img),
                    ann=dict(bboxes=np.zeros((0, 5), np.float32),
                             labels=np.zeros((0,), np.int64))))
            return data_infos

        for ann_file in ann_files:
            gt_bboxes, gt_labels, gt_polys = [], [], []
            gt_bboxes_ig, gt_labels_ig = [], []
            with open(ann_file) as f:
                for line in f:
                    items = line.split()
                    if len(items) < 9:
                        continue
                    poly = np.asarray(items[:8], np.float32)
                    obb = poly2obb_np(poly, self.version)
                    if obb is None:
                        continue
                    name = items[8]
                    if name not in self.cls_map:
                        continue
                    diff = int(items[9]) if len(items) > 9 else 0
                    if diff > self.difficulty:
                        gt_bboxes_ig.append(obb)
                        gt_labels_ig.append(self.cls_map[name])
                    else:
                        gt_bboxes.append(obb)
                        gt_labels.append(self.cls_map[name])
                        gt_polys.append(poly)
            base = osp.splitext(osp.basename(ann_file))[0]
            ann = dict(
                bboxes=np.asarray(gt_bboxes, np.float32).reshape(-1, 5),
                labels=np.asarray(gt_labels, np.int64).reshape(-1),
                bboxes_ignore=np.asarray(gt_bboxes_ig,
                                         np.float32).reshape(-1, 5),
                labels_ignore=np.asarray(gt_labels_ig, np.int64).reshape(-1))
            data_infos.append(dict(filename=base + '.png', ann=ann))
        if self.filter_empty_gt and not self.test_mode:
            data_infos = [d for d in data_infos
                          if len(d['ann']['labels'])]
        return data_infos

    def get_ann_info(self, idx: int) -> Dict:
        return self.data_infos[idx]['ann']

    def __getitem__(self, idx: int):
        info = self.data_infos[idx]
        results = dict(img_info=dict(filename=info['filename']),
                       ann_info=info['ann'], img_prefix=self.img_prefix)
        out = self.pipeline(results)
        if out is None:  # augmentation dropped all gts -> resample
            return self[np.random.randint(len(self))]
        return out

    # ---- evaluation -----------------------------------------------------
    def evaluate(self, results, metric: str = 'mAP', iou_thr: float = 0.5,
                 logger=None, use_07_metric: bool = True, nproc: int = 4):
        annotations = [self.get_ann_info(i) for i in range(len(self))]
        assert metric == 'mAP'
        mean_ap, _ = eval_rbbox_map(results, annotations, iou_thr=iou_thr,
                                    use_07_metric=use_07_metric,
                                    dataset=self.CLASSES, logger=logger)
        return {'mAP': mean_ap}

    # ---- patch-merge + DOTA submission ----------------------------------
    def merge_det(self, results, nproc: int = 4):
        """Translate per-patch detections back to original-image coordinates
        (``__x___y`` offsets in the tile filename, reference
        ``dota.py:216-276``) and merge with per-class rotated NMS."""
        from ..ops.nms import nms_rotated_np

        pattern = re.compile(r'__(\d+)___(\d+)')
        collector = defaultdict(list)
        for info, dets_per_cls in zip(self.data_infos, results):
            fname = osp.splitext(info['filename'])[0]
            match = pattern.search(fname)
            if match:
                x_off, y_off = float(match.group(1)), float(match.group(2))
                # tiles are named ``id__<size>__<x>___<y>`` (reference
                # ``dota.py:251`` splits on the first '__')
                orig = fname.split('__', 1)[0]
            else:
                x_off = y_off = 0.0
                orig = fname
            for cls, dets in enumerate(dets_per_cls):
                dets = np.asarray(dets, np.float32).reshape(-1, 6)
                if len(dets) == 0:
                    continue
                d = dets.copy()
                d[:, 0] += x_off
                d[:, 1] += y_off
                lab = np.full((len(d), 1), cls, np.float32)
                collector[orig].append(np.concatenate([d, lab], -1))

        merged_ids, merged = [], []
        for img_id, parts in collector.items():
            dets = np.concatenate(parts, 0)
            out_per_cls = []
            for cls in range(len(self.CLASSES)):
                cd = dets[dets[:, 6] == cls][:, :6]
                if len(cd) == 0:
                    out_per_cls.append(np.zeros((0, 6), np.float32))
                    continue
                # host NMS: native C++ greedy kernel (grid-binned,
                # orientedobjectdetection_tpu/native) when a toolchain is
                # available, else the bucketed device path — ragged
                # per-class counts never force per-N recompiles
                keep = nms_rotated_np(cd[:, :5], cd[:, 5], 0.1)
                out_per_cls.append(cd[keep])
            merged_ids.append(img_id)
            merged.append(out_per_cls)
        return merged_ids, merged

    def format_results(self, results, submission_dir: Optional[str] = None,
                       nproc: int = 4, **kwargs):
        """Write DOTA ``Task1_<cls>.txt`` submission files + zip
        (reference ``dota.py:278-355``)."""
        submission_dir = submission_dir or tempfile.mkdtemp()
        os.makedirs(submission_dir, exist_ok=True)
        ids, merged = self.merge_det(results, nproc)
        files = {}
        for cls_idx, cls_name in enumerate(self.CLASSES):
            path = osp.join(submission_dir, f'Task1_{cls_name}.txt')
            files[cls_name] = open(path, 'w')
        try:
            for img_id, dets_per_cls in zip(ids, merged):
                for cls_idx, cls_name in enumerate(self.CLASSES):
                    dets = dets_per_cls[cls_idx]
                    if len(dets) == 0:
                        continue
                    polys = obb2poly_np(dets, self.version)
                    for p in polys:
                        coords = ' '.join(f'{v:.2f}' for v in p[:8])
                        files[cls_name].write(
                            f'{img_id} {p[8]:.4f} {coords}\n')
        finally:
            for f in files.values():
                f.close()
        zip_path = osp.join(submission_dir, 'submission.zip')
        with zipfile.ZipFile(zip_path, 'w', zipfile.ZIP_DEFLATED) as zf:
            for cls_name in self.CLASSES:
                p = osp.join(submission_dir, f'Task1_{cls_name}.txt')
                zf.write(p, osp.basename(p))
        return zip_path


@DATASETS.register_module()
class SARDataset(DOTADataset):
    """SSDD/HRSID ship detection (reference ``datasets/sar.py:7-12``)."""
    CLASSES = ('ship',)
    PALETTE = [(0, 255, 0)]


@DATASETS.register_module()
class DOTAv15Dataset(DOTADataset):
    CLASSES = DOTADataset.CLASSES + ('container-crane',)


@DATASETS.register_module()
class DOTAv2Dataset(DOTADataset):
    CLASSES = DOTADataset.CLASSES + ('container-crane', 'airport',
                                     'helipad')
