"""Gather trained models for release (reference ``.dev_scripts/gather_models.py``).

Walks ``work_dirs/`` (or an explicit list of experiment dirs), and for every
experiment that has a training log:

- picks the best-mAP checkpoint if present, else the latest rotation ckpt;
- strips optimizer state (keeps ``params``/``batch_stats``) and appends a
  sha256 content hash to the filename, mirroring
  ``tools/model_converters/publish_model.py``;
- reads the final/best eval metrics out of ``train_log.jsonl``;
- copies the matching config next to the model;
- emits a ``model_index.json`` summary compatible with the per-family
  ``metafile.yml`` layout under ``configs/``.

    python .dev_scripts/gather_models.py --root work_dirs --out models/

Unlike the reference (which keys epochs out of mmcv logs and .pth files,
reference ``gather_models.py:29-66``), checkpoints here are flax msgpack
pytrees and logs are JSONL, so everything is parsed with the stdlib.
"""
import argparse
import glob
import hashlib
import json
import os
import os.path as osp
import shutil

from flax import serialization


def _best_metrics(log_path):
    """(best_mAP, final_record) from a train_log.jsonl."""
    best, final = None, None
    with open(log_path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if 'mAP' in rec:
                final = rec
                if best is None or rec['mAP'] > best['mAP']:
                    best = rec
    return best, final


def _pick_checkpoint(exp_dir):
    best = sorted(glob.glob(osp.join(exp_dir, 'best_*.msgpack')))
    if best:
        return best[-1]
    ckpts = sorted(glob.glob(osp.join(exp_dir, 'ckpt_*.msgpack')))
    return ckpts[-1] if ckpts else None


def _publish(ckpt_path, out_dir, stem):
    with open(ckpt_path, 'rb') as f:
        state = serialization.msgpack_restore(f.read())
    if isinstance(state, dict):
        published = {k: v for k, v in state.items()
                     if k in ('params', 'batch_stats')} or state
    else:
        published = state
    blob = serialization.msgpack_serialize(published)
    sha = hashlib.sha256(blob).hexdigest()[:8]
    out = osp.join(out_dir, f'{stem}-{sha}.msgpack')
    with open(out, 'wb') as f:
        f.write(blob)
    return out


def _find_config(name):
    hits = glob.glob(osp.join('configs', '*', name + '.py'))
    return hits[0] if hits else None


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument('--root', default='work_dirs',
                   help='directory holding experiment work dirs')
    p.add_argument('--out', default='models',
                   help='output directory for published models')
    p.add_argument('--min-map', type=float, default=None,
                   help='skip experiments whose best mAP is below this')
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    index = []
    exp_dirs = sorted(
        d for d in glob.glob(osp.join(args.root, '**'), recursive=True)
        if osp.isfile(osp.join(d, 'train_log.jsonl')))
    for exp_dir in exp_dirs:
        name = osp.basename(exp_dir.rstrip('/'))
        best, final = _best_metrics(osp.join(exp_dir, 'train_log.jsonl'))
        ckpt = _pick_checkpoint(exp_dir)
        if ckpt is None or best is None:
            print(f'skip {name}: no checkpoint/eval record')
            continue
        if args.min_map is not None and best['mAP'] < args.min_map:
            print(f"skip {name}: best mAP {best['mAP']:.4f} < {args.min_map}")
            continue
        model_dir = osp.join(args.out, name)
        os.makedirs(model_dir, exist_ok=True)
        published = _publish(ckpt, model_dir, name)
        cfg = _find_config(name)
        if cfg:
            shutil.copy(cfg, model_dir)
        entry = dict(
            name=name,
            config=cfg,
            weights=published,
            best_mAP=round(float(best['mAP']), 4),
            best_step=int(best.get('step', -1)),
            final_mAP=round(float(final['mAP']), 4),
        )
        index.append(entry)
        print(f"gathered {name}: mAP {entry['best_mAP']} -> {published}")

    with open(osp.join(args.out, 'model_index.json'), 'w') as f:
        json.dump(index, f, indent=1)
    print(f'{len(index)} models -> {osp.join(args.out, "model_index.json")}')


if __name__ == '__main__':
    main()
