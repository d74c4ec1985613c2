"""Format work_dirs/hard/*/train_log.jsonl into the protocol spread table.

Reads every family's JSONL log, extracts the val-mAP trajectory and
steady-state train rate, and prints a markdown table (descending best mAP)
plus the summary.json the runner writes. Run any time — families still
in flight just show their latest numbers.
"""

import json
import os
import os.path as osp
import sys

ROOT = sys.argv[1] if len(sys.argv) > 1 else 'work_dirs/hard'


def read_family(d):
    log = osp.join(ROOT, d, 'train_log.jsonl')
    if not osp.exists(log):
        return None
    vals, ips = [], []
    for line in open(log):
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if rec.get('mode') == 'val' and 'mAP' in rec:
            vals.append((int(rec.get('epoch', -1)), float(rec['mAP'])))
        elif 'imgs_per_sec' in rec and rec.get('step', 0) > 50:
            ips.append(float(rec['imgs_per_sec']))
    med = sorted(ips)[len(ips) // 2] if ips else float('nan')
    if not vals:
        return dict(name=d, best=-1.0, best_epoch=-1, final=-1.0,
                    last_epoch=-1, ips=med, traj=[])
    best_epoch, best = max(vals, key=lambda v: v[1])
    return dict(name=d, best=best, best_epoch=best_epoch, final=vals[-1][1],
                last_epoch=vals[-1][0], ips=med, traj=vals)


def main():
    rows = [r for r in (read_family(d) for d in sorted(os.listdir(ROOT))
                        if osp.isdir(osp.join(ROOT, d))) if r]
    rows.sort(key=lambda r: -r['best'])
    print('| family | best val mAP | @epoch | final (ep) | train imgs/s |')
    print('|---|---|---|---|---|')
    for r in rows:
        name = r['name'].replace('_hard_synth', '')
        print(f"| {name} | **{r['best']:.3f}** | {r['best_epoch']} | "
              f"{r['final']:.3f} ({r['last_epoch']}) | {r['ips']:.1f} |")
    with open(osp.join(ROOT, 'summary.json'), 'w') as f:
        json.dump({r['name']: r['best'] for r in rows}, f, indent=1)
    print(f'\n{len(rows)} families; summary.json updated', file=sys.stderr)


if __name__ == '__main__':
    main()
