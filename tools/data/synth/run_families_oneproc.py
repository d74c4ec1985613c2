"""Train many protocol families inside ONE JAX process.

The per-family subprocess model pays a fresh axon client init per family,
and that init nondeterministically wedges (round-5 post-mortem: ~half of
fresh clients on this tunnel park forever on their first device RPC).
One long-lived process takes that risk ONCE, shares the in-process jit
caches, and runs families back to back:

    python tools/data/synth/run_families_oneproc.py configs/*/*_hard_synth.py

Families whose train_log.jsonl already has the epoch-12 val record are
skipped; each family trains under try/except so one failure cannot sink
the batch. Logs land in work_dirs/hard/<family>/ exactly like the
subprocess runner's.
"""

import json
import os
import os.path as osp
import sys
import time
import traceback

try:  # prefer the installed package; fall back to the checkout
    import orientedobjectdetection_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..', '..'))

EPOCHS = int(os.environ.get('EPOCHS', 12))


def done(name):
    log = f'work_dirs/hard/{name}/train_log.jsonl'
    if not osp.exists(log):
        return False
    for line in open(log):
        if f'"epoch": {EPOCHS}, "mode": "val"' in line:
            return True
    return False


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir',
                      os.environ.get('JAX_COMPILATION_CACHE_DIR',
                                     '/tmp/oodtpu_jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    from orientedobjectdetection_tpu.apis.train import train_detector
    from orientedobjectdetection_tpu.utils import Config

    for cfg_path in sys.argv[1:]:
        name = osp.splitext(osp.basename(cfg_path))[0]
        if done(name):
            print(f'==== {name} (already done, skipping) ====', flush=True)
            continue
        print(f'==== {name} ====', flush=True)
        t0 = time.time()
        try:
            cfg = Config.fromfile(cfg_path)
            cfg.merge_from_dict({'runner.max_epochs': EPOCHS,
                                 'evaluation.interval': 4,
                                 'checkpoint_config.interval': 4})
            train_detector(cfg, f'work_dirs/hard/{name}', resume=True,
                           dtype=jnp.bfloat16)
            print(f'==== {name} finished in {time.time() - t0:.0f}s ====',
                  flush=True)
        except Exception:
            traceback.print_exc()
            print(f'!!!! {name} FAILED after {time.time() - t0:.0f}s',
                  flush=True)


if __name__ == '__main__':
    main()
