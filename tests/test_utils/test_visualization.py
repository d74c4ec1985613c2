"""Visualization smoke tests (reference ``core/visualization/image.py``:
imshow_det_bboxes / imshow_gt_det_bboxes equivalents)."""

import numpy as np

from orientedobjectdetection_tpu.core.visualization import (
    DOTA_PALETTE, imshow_det_rbboxes, imshow_gt_det_rbboxes)


def _fake_scene():
    img = np.full((128, 160, 3), 90, np.uint8)
    # per-class det lists: class 0 has two boxes, class 1 one box
    result = [
        np.array([[40., 40., 30., 14., 0.3, 0.9],
                  [100., 60., 24., 10., -0.8, 0.12]], np.float32),
        np.array([[80., 90., 40., 18., 1.0, 0.7]], np.float32),
    ]
    return img, result


def test_imshow_det_rbboxes_draws_and_thresholds(tmp_path):
    img, result = _fake_scene()
    out_file = str(tmp_path / 'det.png')
    out = imshow_det_rbboxes(img, result, class_names=('a', 'b'),
                             score_thr=0.3, out_file=out_file)
    assert out.shape == img.shape
    assert (out != img).any(), 'nothing was drawn'
    assert (tmp_path / 'det.png').exists()
    # the 0.12-score box is below the 0.3 threshold: lowering the
    # threshold must draw strictly more pixels
    out_all = imshow_det_rbboxes(img, result, class_names=('a', 'b'),
                                 score_thr=0.05)
    assert (out_all != out).any()
    assert ((out != img).any(-1).sum() < (out_all != img).any(-1).sum())


def test_imshow_det_rbboxes_empty_and_palettes():
    img, _ = _fake_scene()
    for palette in (None, 'dota', 'sar', 'random', [(1, 2, 3)]):
        out = imshow_det_rbboxes(
            img, [np.zeros((0, 6), np.float32)], palette=palette)
        np.testing.assert_array_equal(out, img)


def test_imshow_gt_det_rbboxes_side_by_side(tmp_path):
    img, result = _fake_scene()
    gt = np.array([[40., 40., 30., 14., 0.3],
                   [80., 90., 40., 18., 1.0]], np.float32)
    labels = np.array([0, 1])
    out_file = str(tmp_path / 'gt_det.png')
    out = imshow_gt_det_rbboxes(img, gt, labels, result,
                                class_names=('a', 'b'), out_file=out_file)
    # side-by-side: gt | 4px separator | det
    assert out.shape == (128, 160 * 2 + 4, 3)
    assert (tmp_path / 'gt_det.png').exists()
    # both halves differ from the raw image (boxes drawn on each side)
    assert (out[:, :160] != img).any()
    assert (out[:, 164:] != img).any()


def test_imshow_gt_det_rbboxes_empty_gt():
    img, result = _fake_scene()
    out = imshow_gt_det_rbboxes(img, np.zeros((0, 5), np.float32),
                                np.zeros((0,), np.int64), result)
    assert out.shape == (128, 160 * 2 + 4, 3)
    # gt half untouched
    np.testing.assert_array_equal(out[:, :160], img)


def test_palette_is_bgr_int_tuples():
    for c in DOTA_PALETTE:
        assert len(c) == 3 and all(0 <= v <= 255 for v in c)
