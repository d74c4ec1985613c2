"""Collect best checkpoints + metrics for release (reference
``.dev_scripts/gather_models.py``): scans work_dirs for train_log.jsonl +
checkpoints, picks the last (or best-eval) checkpoint per config, publishes
it (strip optimizer, sha256 suffix) into an output directory with a
model-index style summary.

    python .dev_scripts/gather_models.py work_dirs/ gathered/
"""
import argparse
import json
import os
import os.path as osp
import shutil
import subprocess
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('root', help='work_dirs root to scan')
    p.add_argument('out', help='output directory')
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    index = []
    for d in sorted(os.listdir(args.root)):
        wd = osp.join(args.root, d)
        if not osp.isdir(wd):
            continue
        ckpts = sorted([f for f in os.listdir(wd)
                        if f.startswith('ckpt_') and f.endswith('.msgpack')],
                       key=lambda f: int(f.split('_')[1].split('.')[0]))
        if not ckpts:
            continue
        last = osp.join(wd, ckpts[-1])
        entry = {'config': d, 'checkpoint': ckpts[-1]}
        log = osp.join(wd, 'train_log.jsonl')
        if osp.exists(log):
            with open(log) as f:
                lines = [json.loads(x) for x in f if x.strip()]
            if lines:
                entry['final_metrics'] = lines[-1]
        dst = osp.join(args.out, f'{d}.msgpack')
        r = subprocess.run(
            [sys.executable,
             osp.join(REPO, 'tools', 'model_converters', 'publish_model.py'),
             last, dst], capture_output=True, text=True)
        if r.returncode == 0:
            entry['published'] = r.stdout.strip().split()[-1]
        else:
            shutil.copy(last, dst)
            entry['published'] = dst
        index.append(entry)

    out_index = osp.join(args.out, 'model_index.json')
    with open(out_index, 'w') as f:
        json.dump(index, f, indent=2)
    print(f'gathered {len(index)} models -> {out_index}')


if __name__ == '__main__':
    main()
