"""Train-log analysis (reference ``tools/analysis_tools/analyze_logs.py``).

Operates on this framework's JSONL train logs (``train_log.jsonl``).

    python tools/analysis_tools/analyze_logs.py plot_curve \
        work_dirs/exp/train_log.jsonl --keys loss loss_cls --out curve.png
    python tools/analysis_tools/analyze_logs.py cal_train_time \
        work_dirs/exp/train_log.jsonl
"""

import argparse
import json


def load_log(path):
    entries = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                entries.append(json.loads(line))
    return entries


def plot_curve(args):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    for path in args.json_logs:
        entries = load_log(path)
        steps = [e['step'] for e in entries]
        for key in args.keys:
            vals = [e.get(key) for e in entries]
            plt.plot(steps, vals, label=f'{path}:{key}')
    plt.xlabel('step')
    plt.legend()
    plt.grid(True, alpha=0.3)
    out = args.out or 'curve.png'
    plt.savefig(out, dpi=120, bbox_inches='tight')
    print(f'wrote {out}')


def cal_train_time(args):
    for path in args.json_logs:
        entries = load_log(path)
        rates = [e['imgs_per_sec'] for e in entries if 'imgs_per_sec' in e]
        if not rates:
            print(f'{path}: no throughput entries')
            continue
        import statistics
        print(f'{path}: imgs/sec mean {statistics.mean(rates):.2f} '
              f'median {statistics.median(rates):.2f} '
              f'max {max(rates):.2f} (n={len(rates)})')


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest='task', required=True)
    pc = sub.add_parser('plot_curve')
    pc.add_argument('json_logs', nargs='+')
    pc.add_argument('--keys', nargs='+', default=['loss'])
    pc.add_argument('--out', default=None)
    ct = sub.add_parser('cal_train_time')
    ct.add_argument('json_logs', nargs='+')
    args = p.parse_args()
    if args.task == 'plot_curve':
        plot_curve(args)
    else:
        cal_train_time(args)


if __name__ == '__main__':
    main()
