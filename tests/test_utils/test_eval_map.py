"""Rotated mAP evaluator tests."""

import numpy as np

from orientedobjectdetection_tpu.core.eval_map import (average_precision,
                                                       eval_rbbox_map,
                                                       tpfp_default)


def test_tpfp_basic():
    gt = np.array([[50, 50, 40, 20, 0.0]], np.float32)
    dets = np.array([
        [50, 50, 40, 20, 0.0, 0.9],     # perfect match -> TP
        [50, 50, 40, 20, 0.0, 0.8],     # duplicate -> FP
        [200, 200, 40, 20, 0.0, 0.7],   # miss -> FP
    ], np.float32)
    tp, fp = tpfp_default(dets, gt, None, iou_thr=0.5)
    assert list(tp) == [1, 0, 0]
    assert list(fp) == [0, 1, 1]


def test_tpfp_ignore_region():
    gt = np.zeros((0, 5), np.float32)
    gt_ig = np.array([[50, 50, 40, 20, 0.0]], np.float32)
    dets = np.array([[50, 50, 40, 20, 0.0, 0.9]], np.float32)
    tp, fp = tpfp_default(dets, gt, gt_ig, iou_thr=0.5)
    # det matched an ignore gt: neither tp nor fp
    assert tp.sum() == 0 and fp.sum() == 0


def test_perfect_detections_map_one():
    anns = [dict(bboxes=np.array([[50, 50, 40, 20, 0.3]], np.float32),
                 labels=np.array([0]))]
    dets = [[np.array([[50, 50, 40, 20, 0.3, 0.99]], np.float32)]]
    mean_ap, results = eval_rbbox_map(dets, anns, iou_thr=0.5,
                                      logger='silent')
    assert mean_ap > 0.99


def test_average_precision_modes():
    recalls = np.array([0.5, 1.0])
    precisions = np.array([1.0, 1.0])
    assert average_precision(recalls, precisions, '11points') > 0.99
    assert average_precision(recalls, precisions, 'area') > 0.99
    # precision drop
    r = np.array([0.5, 1.0])
    p = np.array([1.0, 0.5])
    a = average_precision(r, p, 'area')
    assert 0.7 < a < 0.8


def test_empty_detections():
    anns = [dict(bboxes=np.array([[50, 50, 40, 20, 0.3]], np.float32),
                 labels=np.array([0]))]
    dets = [[np.zeros((0, 6), np.float32)]]
    mean_ap, _ = eval_rbbox_map(dets, anns, logger='silent')
    assert mean_ap == 0.0
