"""Config-driven training loop.

Replaces the reference's mmcv-runner stack (``apis/train.py:16-144``:
build_dataloader -> build_ddp -> EpochBasedRunner + hooks) with a flat JAX
loop: sharded-batch jitted step over the device mesh, JSONL logging, orbax
checkpoints, per-epoch eval. Multi-host: each process shards the dataset by
``jax.process_index()`` (replaces DistributedSampler).
"""

from __future__ import annotations

import json
import os
import os.path as osp
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..datasets import build_dataset
from ..datasets.loader import DataLoader, strip_host_normalize
from ..models import build_detector
from ..parallel.mesh import batch_sharding, make_mesh, replicated
from ..parallel.train_state import (build_lr_schedule, build_optimizer,
                                    create_train_state, make_train_step)
from ..utils.checkpoint import (find_latest_checkpoint, load_checkpoint,
                                save_checkpoint)


def maybe_init_distributed():
    """Multi-host init (replaces init_dist/NCCL, reference
    ``tools/train.py:70-74``): explicit env vars, or automatic on Cloud TPU
    pods."""
    import os as _os
    if _os.environ.get('JAX_COORDINATOR'):
        from jax._src import distributed as _dist
        if getattr(_dist.global_state, 'client', None) is not None:
            return      # idempotent: already joined the cluster
        jax.distributed.initialize(
            coordinator_address=_os.environ['JAX_COORDINATOR'],
            num_processes=int(_os.environ['JAX_NUM_PROCESSES']),
            process_id=int(_os.environ['JAX_PROCESS_ID']))


def train_detector(cfg, work_dir: str, resume: bool = False,
                   resume_from: Optional[str] = None,
                   max_steps: Optional[int] = None, log_interval: int = 50,
                   dtype=jnp.float32, seed: int = 0):
    maybe_init_distributed()
    os.makedirs(work_dir, exist_ok=True)
    log_path = osp.join(work_dir, 'train_log.jsonl')

    # device-side normalization (default on): strip the host pipeline's
    # Normalize and fold it into the jitted step — uint8 host batches,
    # ~25% less host pipeline work at 1024 px, 4x less H2D traffic
    train_cfg = dict(cfg.data['train'])
    device_norm = None
    if cfg.data.get('normalize_on_device', True):
        train_cfg, device_norm = strip_host_normalize(train_cfg)
    dataset = build_dataset(train_cfg)
    batch_size = int(cfg.data.get('samples_per_gpu', 2)) * \
        jax.local_device_count()
    loader = DataLoader(
        dataset, batch_size=batch_size,
        max_gt=int(cfg.data.get('max_gt', 512)),
        pad_size=cfg.data.get('pad_size'),
        num_workers=int(cfg.data.get('workers_per_gpu', 2)) * 4,
        worker_type=cfg.data.get('worker_type', 'thread'),
        seed=seed, shard_id=jax.process_index(),
        num_shards=jax.process_count())
    steps_per_epoch = len(loader)
    max_epochs = int(cfg.runner.get('max_epochs', 12))
    total_steps = max_steps or steps_per_epoch * max_epochs

    detector = build_detector(dict(cfg.model), dtype=dtype)
    rng = jax.random.PRNGKey(seed)
    sample = next(iter(loader))
    # init traces shapes only — always feed the post-normalization dtype
    init_images = jnp.asarray(sample['images'][:1], jnp.float32)

    sched = build_lr_schedule(dict(cfg.lr_config),
                              float(cfg.optimizer['lr']), steps_per_epoch,
                              total_steps=total_steps)
    # one JITTED init, reused for the train state: eager flax init
    # dispatches thousands of tiny XLA programs (minutes on a 1-core
    # host), and a second init inside create_train_state would re-trace
    variables = jax.jit(detector.init)(rng, init_images)
    frozen = int(cfg.model.get('backbone', {}).get('frozen_stages', -1))
    grad_clip = cfg.get('optimizer_config', {}).get('grad_clip')
    tx = build_optimizer(dict(cfg.optimizer), sched,
                         dict(grad_clip) if grad_clip else None,
                         params=variables['params'], frozen_stages=frozen)
    state = create_train_state(detector, rng, init_images, tx,
                               variables=variables)

    if resume_from:
        # explicit checkpoint path (reference ``tools/train.py``
        # --resume-from -> cfg.resume_from -> runner.resume)
        state = load_checkpoint(resume_from, state)
        print(f'resumed from {resume_from} (step {int(state.step)})')
    elif resume:
        latest = find_latest_checkpoint(work_dir)
        if latest:
            state = load_checkpoint(latest, state)
            print(f'resumed from {latest} (step {int(state.step)})')

    mesh = make_mesh()
    data_shard = batch_sharding(mesh)
    repl = replicated(mesh)
    state = jax.tree.map(lambda x: jax.device_put(x, repl), state)
    norm_eval = bool(cfg.model.get('backbone', {}).get('norm_eval', True))
    step_fn = jax.jit(make_train_step(detector, tx, norm_eval=norm_eval,
                                      device_norm=device_norm))

    if jax.process_count() > 1:
        # multi-host: each process holds only ITS loader shard of the
        # global batch — assemble the global array from per-process local
        # data (device_put with a global sharding would require identical
        # data on every process)
        def put(batch):
            return {k: jax.make_array_from_process_local_data(
                        data_shard, np.asarray(v))
                    for k, v in batch.items() if k != 'img_metas'}
    else:
        def put(batch):
            return {k: jax.device_put(jnp.asarray(v), data_shard)
                    for k, v in batch.items() if k != 'img_metas'}

    # ---- in-training evaluation (reference EvalHook, apis/train.py:104-132)
    eval_cfg = dict(cfg.get('evaluation') or {})
    eval_interval = int(eval_cfg.get('interval', 1))       # in epochs
    eval_dataset = None
    eval_bundle = None
    if eval_cfg and cfg.data.get('val') and \
            eval_cfg.get('metric', 'mAP') == 'mAP':
        try:
            eval_dataset = build_dataset(dict(cfg.data['val'],
                                              test_mode=True,
                                              filter_empty_gt=False))
        except Exception as e:                            # data not on disk
            print(f'eval dataset unavailable, skipping in-training eval: '
                  f'{e}')

    def run_eval(variables):
        nonlocal eval_bundle
        from .eval import _default_norm, eval_from_state
        from .inference import DetectorBundle
        if eval_bundle is None:
            eval_norm = _default_norm(cfg) if \
                cfg.data.get('normalize_on_device', True) else None
            eval_bundle = DetectorBundle(cfg, detector, variables,
                                         dtype=dtype,
                                         device_norm=eval_norm)
        return eval_from_state(
            eval_bundle, variables, eval_dataset,
            batch_size=int(eval_cfg.get('samples_per_gpu', 8)),
            max_images=eval_cfg.get('max_images'))

    ckpt_interval = int(dict(cfg.get('checkpoint_config')
                             or {}).get('interval', 1))   # in epochs
    best_map = -1.0
    step = int(state.step)
    t0 = time.time()
    with open(log_path, 'a') as logf:
        while step < total_steps:
            for batch in loader:
                state, metrics = step_fn(state, put(batch))
                step += 1
                if step % log_interval == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    m.update(step=step, epoch=step // steps_per_epoch,
                             lr=float(sched(step)),
                             imgs_per_sec=batch_size * log_interval /
                             (time.time() - t0))
                    t0 = time.time()
                    logf.write(json.dumps(m) + '\n')
                    logf.flush()
                    print(f'step {step}/{total_steps} ' +
                          ' '.join(f'{k}={v:.4f}' for k, v in m.items()
                                   if isinstance(v, float)))
                if step % steps_per_epoch == 0:
                    epoch = step // steps_per_epoch
                    if jax.process_index() == 0 and \
                            epoch % ckpt_interval == 0:
                        save_checkpoint(work_dir, jax.device_get(state),
                                        step)
                    if eval_dataset is not None and \
                            epoch % eval_interval == 0:
                        variables = {'params': state.params}
                        if getattr(state, 'batch_stats', None):
                            variables['batch_stats'] = state.batch_stats
                        ev = run_eval(variables)
                        logf.write(json.dumps(dict(
                            step=step, epoch=epoch, mode='val', **{
                                k: float(v) for k, v in ev.items()})) + '\n')
                        logf.flush()
                        print(f'epoch {epoch} val: {ev}')
                        if float(ev.get('mAP', -1)) > best_map and \
                                jax.process_index() == 0:
                            best_map = float(ev['mAP'])
                            save_checkpoint(work_dir,
                                            jax.device_get(state), step,
                                            prefix='best')
                        t0 = time.time()
                if step >= total_steps:
                    break
    if jax.process_index() == 0:
        save_checkpoint(work_dir, jax.device_get(state), step)
    return state
