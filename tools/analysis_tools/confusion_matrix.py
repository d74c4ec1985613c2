"""Rotated-IoU confusion matrix from pickled results (reference
``tools/analysis_tools/confusion_matrix.py:11-262``).

    python tools/analysis_tools/confusion_matrix.py <config> <results.pkl> \
        <out_dir> [--score-thr 0.3] [--tp-iou-thr 0.5]
"""
import argparse
import os
import os.path as osp
import pickle
import sys

import numpy as np

try:  # prefer the installed package; fall back to the checkout
    import orientedobjectdetection_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..'))


def calculate_confusion_matrix(dataset, results, score_thr=0.3,
                               tp_iou_thr=0.5):
    import jax.numpy as jnp
    from orientedobjectdetection_tpu.ops import box_iou_rotated

    n = len(dataset.CLASSES)
    cm = np.zeros((n + 1, n + 1))   # +1 = background/missed
    for idx, per_cls in enumerate(results):
        ann = dataset.get_ann_info(idx)
        gts, gt_labels = ann['bboxes'], ann['labels']
        det_list, det_labels = [], []
        for c, d in enumerate(per_cls):
            d = np.asarray(d).reshape(-1, 6)
            d = d[d[:, 5] >= score_thr]
            det_list.append(d)
            det_labels.extend([c] * len(d))
        dets = np.concatenate(det_list) if det_list else \
            np.zeros((0, 6), np.float32)
        det_labels = np.asarray(det_labels, np.int64)
        gt_hit = np.zeros(len(gts), bool)
        if len(dets) and len(gts):
            ious = np.asarray(box_iou_rotated(
                jnp.asarray(dets[:, :5]), jnp.asarray(gts)))
            for i in np.argsort(-dets[:, 5]):
                j = ious[i].argmax()
                if ious[i, j] >= tp_iou_thr:
                    cm[gt_labels[j], det_labels[i]] += 1
                    gt_hit[j] = True
                else:
                    cm[n, det_labels[i]] += 1    # background -> det (FP)
        elif len(dets):
            for lb in det_labels:
                cm[n, lb] += 1
        for j in np.nonzero(~gt_hit)[0]:
            cm[gt_labels[j], n] += 1             # missed gt
    return cm


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('prediction_path')
    p.add_argument('save_dir')
    p.add_argument('--score-thr', type=float, default=0.3)
    p.add_argument('--tp-iou-thr', type=float, default=0.5)
    args = p.parse_args()

    from orientedobjectdetection_tpu.datasets import build_dataset
    from orientedobjectdetection_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    dataset = build_dataset(dict(cfg.data['val'], test_mode=True,
                                 filter_empty_gt=False))
    with open(args.prediction_path, 'rb') as f:
        results = pickle.load(f)
    cm = calculate_confusion_matrix(dataset, results, args.score_thr,
                                    args.tp_iou_thr)
    os.makedirs(args.save_dir, exist_ok=True)
    np.save(osp.join(args.save_dir, 'confusion_matrix.npy'), cm)
    names = list(dataset.CLASSES) + ['background']
    print('rows = gt, cols = det')
    print('\t' + '\t'.join(n[:8] for n in names))
    for i, row in enumerate(cm):
        print(names[i][:8] + '\t' + '\t'.join(str(int(v)) for v in row))


if __name__ == '__main__':
    main()
