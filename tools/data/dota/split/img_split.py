"""Offline DOTA huge-image tiler.

Reimplements reference ``tools/data/dota/split/img_split.py`` (767 LoC):
slides windows (sizes/gaps) over each image, keeps windows by object
coverage, writes patch images + annfiles named ``<base>__<x>___<y>.png``
(the offset encoding ``datasets/dota.py:216-276`` parses back at merge).

Usage:
    python tools/data/dota/split/img_split.py \
        --base-json tools/data/dota/split/split_configs/ss_trainval.json
or explicit flags:
    python tools/data/dota/split/img_split.py \
        --img-dirs data/DOTA/train/images --ann-dirs data/DOTA/train/labelTxt \
        --save-dir data/split_1024 --sizes 1024 --gaps 200
"""

import argparse
import json
import os
import os.path as osp
import sys
from concurrent.futures import ThreadPoolExecutor
from functools import partial

import cv2
import numpy as np

try:  # prefer the installed package; fall back to the checkout
    import orientedobjectdetection_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..', '..', '..'))


def load_dota_ann(ann_path):
    polys, names, diffs = [], [], []
    if ann_path and osp.isfile(ann_path):
        with open(ann_path) as f:
            for line in f:
                items = line.split()
                if len(items) < 9:
                    continue
                try:
                    poly = np.asarray(items[:8], np.float32)
                except ValueError:
                    continue
                polys.append(poly)
                names.append(items[8])
                diffs.append(int(items[9]) if len(items) > 9 else 0)
    return (np.asarray(polys, np.float32).reshape(-1, 8), names,
            np.asarray(diffs, np.int64))


def poly_area(polys):
    x = polys[:, 0::2]
    y = polys[:, 1::2]
    return 0.5 * np.abs(
        np.sum(x * np.roll(y, -1, axis=1) - np.roll(x, -1, axis=1) * y,
               axis=1))


def clip_polys_to_window(polys, x0, y0, x1, y1):
    """Clipped-area ratio of each poly inside the window (approximated by
    clipping the poly's bounding quadrilateral with Sutherland-Hodgman)."""
    ratios = np.zeros(len(polys), np.float32)
    full = poly_area(polys)
    for i, p in enumerate(polys):
        pts = p.reshape(4, 2).tolist()
        for edge in ('left', 'right', 'top', 'bottom'):
            if not pts:
                break
            out = []
            n = len(pts)
            for j in range(n):
                a = pts[j]
                b = pts[(j + 1) % n]

                def inside(q):
                    if edge == 'left':
                        return q[0] >= x0
                    if edge == 'right':
                        return q[0] <= x1
                    if edge == 'top':
                        return q[1] >= y0
                    return q[1] <= y1

                def intersect(a, b):
                    if edge in ('left', 'right'):
                        xe = x0 if edge == 'left' else x1
                        t = (xe - a[0]) / (b[0] - a[0] + 1e-12)
                        return [xe, a[1] + t * (b[1] - a[1])]
                    ye = y0 if edge == 'top' else y1
                    t = (ye - a[1]) / (b[1] - a[1] + 1e-12)
                    return [a[0] + t * (b[0] - a[0]), ye]

                if inside(a):
                    out.append(a)
                    if not inside(b):
                        out.append(intersect(a, b))
                elif inside(b):
                    out.append(intersect(a, b))
            pts = out
        if len(pts) >= 3:
            arr = np.asarray(pts)
            xx, yy = arr[:, 0], arr[:, 1]
            area = 0.5 * abs(np.sum(xx * np.roll(yy, -1) -
                                    np.roll(xx, -1) * yy))
            ratios[i] = area / max(full[i], 1e-6)
    return ratios


def get_windows(width, height, sizes, gaps, img_rate_thr=0.6):
    from orientedobjectdetection_tpu.core.patch import slide_window
    steps = [s - g for s, g in zip(sizes, gaps)]
    return slide_window(width, height, sizes, steps, img_rate_thr)


def split_one(task, save_img_dir, save_ann_dir, sizes, gaps,
              iof_thr=0.7, no_padding=False, padding_value=(104, 116, 124),
              img_ext='.png'):
    img_path, ann_path = task
    img = cv2.imread(img_path, cv2.IMREAD_COLOR)
    if img is None:
        return 0
    h, w = img.shape[:2]
    base = osp.splitext(osp.basename(img_path))[0]
    polys, names, diffs = load_dota_ann(ann_path)
    windows = get_windows(w, h, sizes, gaps)
    n_out = 0
    for (x, y, ww, hh) in windows:
        x1, y1 = int(x), int(y)
        x2, y2 = int(min(x + ww, w)), int(min(y + hh, h))
        patch = img[y1:y2, x1:x2]
        if not no_padding and (patch.shape[0] < hh or patch.shape[1] < ww):
            canvas = np.empty((hh, ww, 3), img.dtype)
            canvas[...] = padding_value
            canvas[:patch.shape[0], :patch.shape[1]] = patch
            patch = canvas
        # Reference naming ``id__<size>__<x>___<y>`` (img_split.py:307-309):
        # the window size keeps multi-scale splits (rates 0.5/1.0/1.5 ->
        # different window sizes) from colliding on shared (x, y) offsets.
        name = f'{base}__{int(ww)}__{x1}___{y1}'
        lines = []
        if len(polys):
            ratios = clip_polys_to_window(polys, x1, y1, x2, y2)
            keep = ratios >= iof_thr
            # objects partially inside (ratio in (0, thr)) are kept as
            # difficulty-2 truncated objects in the reference; we keep only
            # fully-enough-covered ones plus mark truncated as difficult.
            trunc = (ratios > 1e-3) & ~keep
            for idx in np.nonzero(keep | trunc)[0]:
                p = polys[idx].copy()
                p[0::2] -= x1
                p[1::2] -= y1
                diff = diffs[idx] if keep[idx] else 2
                coords = ' '.join(f'{v:.1f}' for v in p)
                lines.append(f'{coords} {names[idx]} {diff}')
        if ann_path is not None and not lines:
            continue  # skip empty patches for annotated splits
        cv2.imwrite(osp.join(save_img_dir, name + img_ext), patch)
        if ann_path is not None:
            with open(osp.join(save_ann_dir, name + '.txt'), 'w') as f:
                f.write('\n'.join(lines))
        n_out += 1
    return n_out


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--base-json', default=None)
    p.add_argument('--img-dirs', nargs='+', default=None)
    p.add_argument('--ann-dirs', nargs='+', default=None)
    p.add_argument('--save-dir', default=None)
    p.add_argument('--sizes', type=int, nargs='+', default=[1024])
    p.add_argument('--gaps', type=int, nargs='+', default=[200])
    p.add_argument('--rates', type=float, nargs='+', default=[1.0])
    p.add_argument('--iof-thr', type=float, default=0.7)
    p.add_argument('--nproc', type=int, default=8)
    args = p.parse_args()

    if args.base_json:
        with open(args.base_json) as f:
            cfg = json.load(f)
        for k, v in cfg.items():
            key = k.replace('-', '_')
            if getattr(args, key, None) in (None, [1024], [200], [1.0]):
                setattr(args, key, v)

    sizes, gaps = [], []
    for r in args.rates:
        for s, g in zip(args.sizes, args.gaps):
            sizes.append(int(s / r))
            gaps.append(int(g / r))

    save_img = osp.join(args.save_dir, 'images')
    save_ann = osp.join(args.save_dir, 'annfiles')
    os.makedirs(save_img, exist_ok=True)
    os.makedirs(save_ann, exist_ok=True)

    tasks = []
    for i, img_dir in enumerate(args.img_dirs):
        ann_dir = args.ann_dirs[i] if args.ann_dirs else None
        for fname in sorted(os.listdir(img_dir)):
            if not fname.lower().endswith(('.png', '.jpg', '.bmp', '.tif')):
                continue
            ann = osp.join(ann_dir, osp.splitext(fname)[0] + '.txt') \
                if ann_dir else None
            tasks.append((osp.join(img_dir, fname), ann))

    worker = partial(split_one, save_img_dir=save_img, save_ann_dir=save_ann,
                     sizes=sizes, gaps=gaps, iof_thr=args.iof_thr)
    with ThreadPoolExecutor(max_workers=args.nproc) as pool:
        counts = list(pool.map(worker, tasks))
    print(f'split {len(tasks)} images -> {sum(counts)} patches '
          f'in {args.save_dir}')


if __name__ == '__main__':
    main()
