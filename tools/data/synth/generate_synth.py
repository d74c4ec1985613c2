"""Synthetic DOTA-format dataset generator (mAP-proof fallback).

No DOTA imagery ships in this environment, so end-to-end detection quality
is demonstrated on a generated dataset in the exact DOTA on-disk layout the
reference consumes (``/root/reference/mmrotate/datasets/dota.py:58-113``:
``{root}/{split}/images/*.png`` + ``{root}/{split}/annfiles/*.txt`` with
``x1 y1 x2 y2 x3 y3 x4 y4 class difficulty`` lines).  Training
``configs/rotated_retinanet/rotated_retinanet_tiny_synth.py`` on this data to
>0.9 mAP exercises the full stack: loader -> pipeline -> assign -> loss ->
sharded step -> decode -> rotated NMS -> ``eval_rbbox_map``.

Scenes are rotated rectangles on a cluttered background; the two classes are
distinguishable by color and aspect ("plane": warm, squarish with a cross
strut; "ship": cool, elongated with a bright bow), so a converged detector
must regress (cx, cy, w, h, a) accurately AND classify - random boxes score
~0 mAP at IoU 0.5.
"""

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..', '..'))

from orientedobjectdetection_tpu.ops.boxes import obb2poly_np  # noqa: E402

CLASSES = ('plane', 'ship')


def _rect_poly(cx, cy, w, h, a):
    return obb2poly_np(
        np.asarray([[cx, cy, w, h, a, 0.]], np.float32), 'le90')[0, :8]


def _render(img, poly, cls, rng):
    import cv2
    pts = poly.reshape(4, 2).astype(np.int32)
    if cls == 0:                                   # plane: warm + cross strut
        color = (int(rng.integers(20, 70)), int(rng.integers(20, 70)),
                 int(rng.integers(180, 255)))     # BGR red-ish
        cv2.fillPoly(img, [pts], color)
        mid01, mid23 = (pts[0] + pts[1]) // 2, (pts[2] + pts[3]) // 2
        cv2.line(img, tuple(mid01), tuple(mid23), (240, 240, 240), 2)
    else:                                          # ship: cool + bright bow
        color = (int(rng.integers(180, 255)), int(rng.integers(20, 90)),
                 int(rng.integers(20, 70)))       # BGR blue-ish
        cv2.fillPoly(img, [pts], color)
        bow = (pts[1] + pts[2]) // 2
        cv2.circle(img, tuple(bow), 3, (230, 230, 230), -1)


def _sample_box(cls, size, rng):
    margin = 36
    cx = float(rng.uniform(margin, size - margin))
    cy = float(rng.uniform(margin, size - margin))
    if cls == 0:                                   # plane: squarish
        w = float(rng.uniform(28, 52))
        h = w * float(rng.uniform(0.6, 0.95))
    else:                                          # ship: elongated
        w = float(rng.uniform(40, 70))
        h = w * float(rng.uniform(0.25, 0.42))
    a = float(rng.uniform(-np.pi / 2, np.pi / 2))
    return cx, cy, w, h, a


def generate_synth(root, num_images=200, size=256, seed=0, split='trainval',
                   max_objs=5):
    """Write ``num_images`` synthetic scenes under ``root/split``."""
    import cv2
    img_dir = osp.join(root, split, 'images')
    ann_dir = osp.join(root, split, 'annfiles')
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(num_images):
        img = rng.integers(60, 120, (size, size, 3), np.uint8)
        # background clutter that is NOT a target: thin gray lines + blobs
        for _ in range(int(rng.integers(2, 6))):
            p0 = tuple(int(v) for v in rng.integers(0, size, 2))
            p1 = tuple(int(v) for v in rng.integers(0, size, 2))
            cv2.line(img, p0, p1, (int(rng.integers(90, 150)),) * 3, 1)
        lines = []
        placed = []
        n_obj = int(rng.integers(1, max_objs + 1))
        for _ in range(n_obj):
            cls = int(rng.integers(0, len(CLASSES)))
            for _attempt in range(20):
                cx, cy, w, h, a = _sample_box(cls, size, rng)
                r = max(w, h) / 2
                if all(np.hypot(cx - px, cy - py) > r + pr + 6
                       for px, py, pr in placed):
                    break
            else:
                continue
            placed.append((cx, cy, r))
            poly = _rect_poly(cx, cy, w, h, a)
            _render(img, poly, cls, rng)
            lines.append(' '.join(f'{v:.1f}' for v in poly) +
                         f' {CLASSES[cls]} 0')
        img = cv2.GaussianBlur(img, (3, 3), 0)
        stem = f'P{i:04d}'
        cv2.imwrite(osp.join(img_dir, stem + '.png'), img)
        with open(osp.join(ann_dir, stem + '.txt'), 'w') as f:
            f.write('\n'.join(lines) + ('\n' if lines else ''))
    return root


def generate_synth_hrsc(root, num_images=200, size=256, seed=0,
                        imageset='trainval', max_objs=4):
    """Write synthetic ship scenes in the HRSC2016 on-disk layout the
    reference consumes (``/root/reference/mmrotate/datasets/hrsc.py:17-100``):
    ``{root}/FullDataSet/AllImages/*.bmp`` + ``FullDataSet/Annotations/
    *.xml`` (VOC-style with HRSC_Object mbox_cx/cy/w/h/ang) + an
    ``ImageSets/{imageset}.txt`` id list. Single 'ship' class."""
    import cv2
    img_dir = osp.join(root, 'FullDataSet', 'AllImages')
    ann_dir = osp.join(root, 'FullDataSet', 'Annotations')
    set_dir = osp.join(root, 'ImageSets')
    for d in (img_dir, ann_dir, set_dir):
        os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    ids = []
    for i in range(num_images):
        img = rng.integers(60, 120, (size, size, 3), np.uint8)
        for _ in range(int(rng.integers(2, 6))):
            p0 = tuple(int(v) for v in rng.integers(0, size, 2))
            p1 = tuple(int(v) for v in rng.integers(0, size, 2))
            cv2.line(img, p0, p1, (int(rng.integers(90, 150)),) * 3, 1)
        objs = []
        placed = []
        for _ in range(int(rng.integers(1, max_objs + 1))):
            for _attempt in range(20):
                cx, cy, w, h, a = _sample_box(1, size, rng)   # ship shape
                r = max(w, h) / 2
                if all(np.hypot(cx - px, cy - py) > r + pr + 6
                       for px, py, pr in placed):
                    break
            else:
                continue
            placed.append((cx, cy, r))
            _render(img, _rect_poly(cx, cy, w, h, a), 1, rng)
            objs.append((cx, cy, w, h, a))
        img = cv2.GaussianBlur(img, (3, 3), 0)
        stem = f'H{i:04d}'
        ids.append(stem)
        cv2.imwrite(osp.join(img_dir, stem + '.bmp'), img)
        obj_xml = '\n'.join(
            '    <HRSC_Object>\n'
            '      <Class_ID>100000001</Class_ID>\n'
            f'      <mbox_cx>{cx:.2f}</mbox_cx>\n'
            f'      <mbox_cy>{cy:.2f}</mbox_cy>\n'
            f'      <mbox_w>{w:.2f}</mbox_w>\n'
            f'      <mbox_h>{h:.2f}</mbox_h>\n'
            f'      <mbox_ang>{a:.5f}</mbox_ang>\n'
            '    </HRSC_Object>' for cx, cy, w, h, a in objs)
        with open(osp.join(ann_dir, stem + '.xml'), 'w') as f:
            f.write('<HRSC_Image>\n  <Img_ID>%s</Img_ID>\n'
                    '  <HRSC_Objects>\n%s\n  </HRSC_Objects>\n'
                    '</HRSC_Image>\n' % (stem, obj_xml))
    with open(osp.join(set_dir, imageset + '.txt'), 'w') as f:
        f.write('\n'.join(ids) + '\n')
    return root


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument('--root', default='/tmp/synth_dota')
    p.add_argument('--num-images', type=int, default=200)
    p.add_argument('--size', type=int, default=256)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--split', default='trainval')
    p.add_argument('--hrsc', action='store_true',
                   help='emit the HRSC2016 VOC-XML layout instead of DOTA')
    args = p.parse_args()
    if args.hrsc:
        generate_synth_hrsc(args.root, args.num_images, args.size, args.seed,
                            args.split)
    else:
        generate_synth(args.root, args.num_images, args.size, args.seed,
                       args.split)
    print(f'wrote {args.num_images} images to {args.root}')


if __name__ == '__main__':
    main()
