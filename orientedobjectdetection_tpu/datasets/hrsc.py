"""HRSC2016 ship dataset (VOC-style XML; reference ``datasets/hrsc.py:17-266``).

Annotations carry (cx, cy, w, h, ang) directly in the XML; optional
classwise mode exposes 31 ship classes, default is the single 'ship' class.
Evaluation reports AP50/AP75 like the reference.
"""

from __future__ import annotations

import glob
import os.path as osp
import xml.etree.ElementTree as ET
from typing import List

import numpy as np

from ..core.eval_map import eval_rbbox_map
from ..ops.boxes import norm_angle
from ..utils.registry import DATASETS
from .dota import DOTADataset


@DATASETS.register_module()
class HRSCDataset(DOTADataset):
    CLASSES = ('ship',)
    HRSC_CLASS = '100000001'
    PALETTE = [(0, 255, 0)]
    # reference ``datasets/hrsc.py:31-47``: classwise mode exposes the 31
    # ship types, keyed by Class_ID suffix
    HRSC_CLASSES = ('ship', 'aircraft carrier', 'warcraft', 'merchant ship',
                    'Nimitz', 'Enterprise', 'Arleigh Burke', 'WhidbeyIsland',
                    'Perry', 'Sanantonio', 'Ticonderoga', 'Kitty Hawk',
                    'Kuznetsov', 'Abukuma', 'Austen', 'Tarawa', 'Blue Ridge',
                    'Container', 'OXo|--)', 'Car carrier([]==[])',
                    'Hovercraft', 'yacht', 'CntShip(_|.--.--|_]=', 'Cruise',
                    'submarine', 'lute', 'Medical', 'Car carrier(======|',
                    'Ford-class', 'Midway-class', 'Invincible-class')
    HRSC_CLASSES_ID = ('01', '02', '03', '04', '05', '06', '07', '08', '09',
                       '10', '11', '12', '13', '14', '15', '16', '17', '18',
                       '19', '20', '22', '24', '25', '26', '27', '28', '29',
                       '30', '31', '32', '33')

    def __init__(self, ann_file, pipeline, img_prefix='',
                 img_subdir='AllImages', ann_subdir='Annotations',
                 classwise=False, version='oc', **kwargs):
        self.img_subdir = img_subdir
        self.ann_subdir = ann_subdir
        self.classwise = classwise
        if classwise:
            self.catid2label = {
                '1000000' + cls_id: i
                for i, cls_id in enumerate(self.HRSC_CLASSES_ID)}
            kwargs.setdefault('classes', self.HRSC_CLASSES)
        super().__init__(ann_file, pipeline, img_prefix=img_prefix,
                         version=version, **kwargs)

    def load_annotations(self, ann_file) -> List[dict]:
        data_infos = []
        if osp.isfile(ann_file):  # imageset file of ids
            with open(ann_file) as f:
                ids = [line.strip() for line in f if line.strip()]
        else:
            ids = [osp.splitext(osp.basename(p))[0] for p in
                   sorted(glob.glob(osp.join(ann_file, '*.xml')))]
        ann_root = ann_file if osp.isdir(ann_file) else \
            osp.join(self.img_prefix, self.ann_subdir)
        for img_id in ids:
            xml_path = osp.join(ann_root, f'{img_id}.xml')
            bboxes, labels = [], []
            if osp.isfile(xml_path):
                root = ET.parse(xml_path).getroot()
                for obj in root.findall('.//HRSC_Object'):
                    if self.classwise:
                        label = self.catid2label.get(
                            obj.findtext('Class_ID', ''))
                        if label is None:
                            continue
                    else:
                        label = 0
                    cx = float(obj.findtext('mbox_cx', '0'))
                    cy = float(obj.findtext('mbox_cy', '0'))
                    w = float(obj.findtext('mbox_w', '0'))
                    h = float(obj.findtext('mbox_h', '0'))
                    ang = float(obj.findtext('mbox_ang', '0'))
                    if self.version != 'le90':
                        a = norm_angle(np.asarray(ang), self.version)
                        ang = float(a)
                    if w < h:  # canonical long-edge form
                        w, h = h, w
                        ang = float(norm_angle(np.asarray(ang + np.pi / 2),
                                               self.version))
                    bboxes.append([cx, cy, w, h, ang])
                    labels.append(label)
            ann = dict(
                bboxes=np.asarray(bboxes, np.float32).reshape(-1, 5),
                labels=np.asarray(labels, np.int64).reshape(-1),
                bboxes_ignore=np.zeros((0, 5), np.float32),
                labels_ignore=np.zeros((0,), np.int64))
            data_infos.append(dict(
                filename=osp.join(self.img_subdir, f'{img_id}.bmp'),
                ann=ann))
        if self.filter_empty_gt and not self.test_mode:
            data_infos = [d for d in data_infos if len(d['ann']['labels'])]
        return data_infos

    def evaluate(self, results, metric='mAP', iou_thr=0.5, logger=None,
                 use_07_metric=True, **kwargs):
        annotations = [self.get_ann_info(i) for i in range(len(self))]
        out = {}
        for thr in (0.5, 0.75):
            ap, _ = eval_rbbox_map(results, annotations, iou_thr=thr,
                                   use_07_metric=use_07_metric,
                                   dataset=self.CLASSES, logger='silent')
            out[f'AP{int(thr * 100)}'] = ap
        out['mAP'] = out['AP50']
        return out
