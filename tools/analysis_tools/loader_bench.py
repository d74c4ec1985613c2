"""Input-pipeline vs device-step throughput at production shape.

VERDICT round-3 item 5: the host cv2 pipeline (``datasets/loader.py``
thread pool + prefetch queue) had only ever been exercised at 256 px synth
shapes; this tool measures, for a real config at its real image size:

- **loader-only imgs/s** — iterate the train ``DataLoader`` (decode + aug +
  pad_collate), no device work;
- **device-only imgs/s** — the jitted sharded train step re-fed one host
  batch (includes the per-step ``device_put`` H2D transfer);
- **overlapped imgs/s** — the production loop (loader feeding the step),
  i.e. what ``apis/train.py`` achieves.

The verdict criterion: loader >= 1.2x device rate means the pipeline keeps
the chip fed; otherwise the loader is the bottleneck and the overlapped
rate degrades toward the loader rate.

Reference analog: mmcv's ``workers_per_gpu`` subprocess dataloader
(reference ``apis/train.py`` build_dataloader); this measures our
thread-pool + prefetch-queue equivalent.
"""

import argparse
import ast
import json
import os.path as osp
import sys
import time

try:  # prefer the installed package; fall back to the checkout
    import orientedobjectdetection_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..'))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('config')
    p.add_argument('--batches', type=int, default=20,
                   help='timed batches per phase (plus warmup)')
    p.add_argument('--loader-only', action='store_true',
                   help='skip the device phases (no TPU/JAX compile)')
    p.add_argument('--host-norm', action='store_true',
                   help='keep the pipeline Normalize on the host (the '
                        'pre-round-4 behavior), for A/B comparison')
    p.add_argument('--bf16', action='store_true')
    p.add_argument('--worker-type', choices=['thread', 'process'],
                   default=None,
                   help='override data.worker_type (process = the '
                        'mmcv-style subprocess-worker analog)')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--cfg-options', nargs='+', default=[])
    return p.parse_args()


def main():
    args = parse_args()
    from orientedobjectdetection_tpu.utils import Config
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        opts = {}
        for item in args.cfg_options:
            key, _, val = item.partition('=')
            try:
                val = ast.literal_eval(val)
            except (ValueError, SyntaxError):
                pass
            opts[key] = val
        cfg.merge_from_dict(opts)

    import jax
    import jax.numpy as jnp

    from orientedobjectdetection_tpu.datasets import build_dataset
    from orientedobjectdetection_tpu.datasets.loader import (
        DataLoader, strip_host_normalize)

    train_cfg = dict(cfg.data['train'])
    device_norm = None
    if cfg.data.get('normalize_on_device', True) and not args.host_norm:
        train_cfg, device_norm = strip_host_normalize(train_cfg)
    out_extra = dict(normalize='device' if device_norm else 'host')
    dataset = build_dataset(train_cfg)
    batch_size = int(cfg.data.get('samples_per_gpu', 2)) * \
        jax.local_device_count()
    loader = DataLoader(
        dataset, batch_size=batch_size,
        max_gt=int(cfg.data.get('max_gt', 512)),
        pad_size=cfg.data.get('pad_size'),
        num_workers=int(cfg.data.get('workers_per_gpu', 2)) * 4,
        worker_type=args.worker_type or cfg.data.get('worker_type',
                                                     'thread'),
        seed=args.seed)
    out = dict(batch_size=batch_size,
               worker_type=loader.worker_type,
               dataset_len=len(dataset),
               pad_size=list(cfg.data.get('pad_size') or ()) or None,
               **out_extra)

    def run_loader(n_batches):
        """Iterate up to n_batches (re-entering the loader across epochs),
        timing from after the first yielded batch (pipeline warm)."""
        done = 0
        t0 = None
        first = None
        while done < n_batches + 1:
            for batch in loader:
                if t0 is None:
                    first = batch
                    t0 = time.time()     # timer starts after batch 1
                else:
                    done += 1
                if done >= n_batches + 1:
                    break
        return first, batch_size * n_batches / (time.time() - t0)

    first_batch, loader_rate = run_loader(args.batches)
    out['loader_imgs_per_sec'] = round(loader_rate, 2)
    img_shape = first_batch['images'].shape
    out['image_shape'] = list(img_shape)

    if not args.loader_only:
        from orientedobjectdetection_tpu.models import build_detector
        from orientedobjectdetection_tpu.parallel.mesh import (
            batch_sharding, make_mesh, replicated)
        from orientedobjectdetection_tpu.parallel.train_state import (
            build_lr_schedule, build_optimizer, create_train_state,
            make_train_step)

        dtype = jnp.bfloat16 if args.bf16 else jnp.float32
        detector = build_detector(dict(cfg.model), dtype=dtype)
        rng = jax.random.PRNGKey(args.seed)
        init_images = jnp.asarray(first_batch['images'][:1], jnp.float32)
        sched = build_lr_schedule(dict(cfg.lr_config),
                                  float(cfg.optimizer['lr']), 100,
                                  total_steps=1000)
        variables = detector.init(rng, init_images)
        frozen = int(cfg.model.get('backbone', {}).get('frozen_stages', -1))
        grad_clip = cfg.get('optimizer_config', {}).get('grad_clip')
        tx = build_optimizer(dict(cfg.optimizer), sched,
                             dict(grad_clip) if grad_clip else None,
                             params=variables['params'],
                             frozen_stages=frozen)
        state = create_train_state(detector, rng, init_images, tx)
        mesh = make_mesh()
        data_shard = batch_sharding(mesh)
        state = jax.tree.map(
            lambda x: jax.device_put(x, replicated(mesh)), state)
        norm_eval = bool(cfg.model.get('backbone', {})
                         .get('norm_eval', True))
        step_fn = jax.jit(make_train_step(detector, tx,
                                          norm_eval=norm_eval,
                                          device_norm=device_norm))

        def put(batch):
            return {k: jax.device_put(jnp.asarray(v), data_shard)
                    for k, v in batch.items() if k != 'img_metas'}

        # warmup: compile + 1 steady step
        for _ in range(2):
            state, metrics = step_fn(state, put(first_batch))
        jax.block_until_ready(metrics['loss'])

        # device-only: same host batch each step, fresh H2D each step
        t0 = time.time()
        for _ in range(args.batches):
            state, metrics = step_fn(state, put(first_batch))
        jax.block_until_ready(metrics['loss'])
        device_rate = batch_size * args.batches / (time.time() - t0)
        out['device_imgs_per_sec'] = round(device_rate, 2)
        out['loader_vs_device'] = round(loader_rate / device_rate, 3)

        # overlapped: the production loop shape
        done = 0
        t0 = time.time()
        while done < args.batches:
            for batch in loader:
                state, metrics = step_fn(state, put(batch))
                done += 1
                if done >= args.batches:
                    break
        jax.block_until_ready(metrics['loss'])
        out['overlapped_imgs_per_sec'] = round(
            batch_size * args.batches / (time.time() - t0), 2)

    print(json.dumps(out))


if __name__ == '__main__':
    main()
