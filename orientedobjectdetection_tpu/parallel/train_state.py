"""Optimizer, LR schedule, and the jitted train step.

Replaces the reference's mmcv runner + hooks stack (``apis/train.py:16-144``)
with a functional train step compiled once by XLA:

- SGD momentum + weight decay + grad clip (``schedule_1x.py``:
  lr 0.0025/0.005, momentum 0.9, wd 1e-4, clip max_norm 35);
- step LR with linear warmup (``lr_config`` policy);
- backbone stage freezing via an optax mask (reference
  ``ResNet._freeze_stages``);
- data parallelism by jitting over a mesh with batch-sharded inputs —
  XLA inserts the gradient psum (no DDP object).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def build_lr_schedule(lr_config: dict, base_lr: float,
                      steps_per_epoch: int,
                      total_steps: int = None) -> Callable:
    """Step-decay / cosine schedule with linear warmup (reference
    lr_config). ``total_steps`` feeds cosine annealing when the config does
    not pin ``max_steps`` (mmcv infers it from the runner)."""
    policy = lr_config.get('policy', 'step')
    warmup_iters = int(lr_config.get('warmup_iters', 0) or 0)
    warmup_ratio = float(lr_config.get('warmup_ratio', 1.0))

    if policy == 'step':
        milestones = [int(e) * steps_per_epoch for e in lr_config['step']]
        gamma = float(lr_config.get('gamma', 0.1))

        def base(step):
            factor = jnp.ones((), jnp.float32)
            for m in milestones:
                factor = factor * jnp.where(step >= m, gamma, 1.0)
            return base_lr * factor
    elif policy in ('CosineAnnealing', 'cosine'):
        total = int(lr_config.get('max_steps') or total_steps or
                    steps_per_epoch * 12)
        min_ratio = float(lr_config.get('min_lr_ratio', 0.0))

        def base(step):
            t = jnp.clip(step / max(total, 1), 0, 1)
            cos = 0.5 * (1 + jnp.cos(jnp.pi * t))
            return base_lr * (min_ratio + (1 - min_ratio) * cos)
    else:
        raise ValueError(policy)

    def schedule(step):
        lr = base(step)
        if warmup_iters > 0:
            alpha = jnp.clip(step / warmup_iters, 0, 1)
            warm = base_lr * (warmup_ratio + (1 - warmup_ratio) * alpha)
            lr = jnp.where(step < warmup_iters, warm, lr)
        return lr

    return schedule


def frozen_mask(params, frozen_stages: int = -1):
    """True = trainable. Freezes the ResNet stem + first ``frozen_stages``
    stages (reference ``frozen_stages=1`` in every R50 config)."""
    frozen_prefixes = []
    if frozen_stages >= 0:
        frozen_prefixes += ['backbone/conv1', 'backbone/bn1']
        for s in range(1, frozen_stages + 1):
            frozen_prefixes.append(f'backbone/layer{s}_')

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def trainable(path):
        keystr = '/'.join(
            p.key if hasattr(p, 'key') else str(p) for p in path)
        return not any(keystr.startswith(p) or f'/{p}' in keystr or
                       keystr.find(p) == 0 or p in keystr
                       for p in frozen_prefixes)

    return jax.tree_util.tree_map_with_path(
        lambda path, _: trainable(path), params)


def build_optimizer(optimizer_cfg: dict, lr_schedule: Callable,
                    grad_clip: Optional[dict] = None, params=None,
                    frozen_stages: int = -1):
    """SGD/AdamW + weight decay + clip, mirroring reference optimizer_config."""
    opt_type = optimizer_cfg.get('type', 'sgd').lower()
    wd = float(optimizer_cfg.get('weight_decay', 0.0))
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(
            float(grad_clip.get('max_norm', 35))))
    if opt_type == 'sgd':
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.sgd(lr_schedule,
                               momentum=float(optimizer_cfg.get('momentum',
                                                                0.9))))
    elif opt_type == 'adamw':
        chain.append(optax.adamw(
            lr_schedule, weight_decay=wd,
            b1=float(optimizer_cfg.get('betas', (0.9, 0.999))[0]),
            b2=float(optimizer_cfg.get('betas', (0.9, 0.999))[1])))
    else:
        raise ValueError(opt_type)
    tx = optax.chain(*chain)
    if frozen_stages >= 0 and params is not None:
        mask = frozen_mask(params, frozen_stages)
        tx = optax.multi_transform(
            {'train': tx, 'freeze': optax.set_to_zero()},
            jax.tree.map(lambda t: 'train' if t else 'freeze', mask))
    return tx


def create_train_state(detector, rng, sample_images, tx,
                       variables=None) -> TrainState:
    # jit the init: eager flax init dispatches thousands of tiny XLA
    # programs (minutes on a 1-core host); one jitted program is fast.
    # Callers that already initialized pass ``variables`` to skip it.
    if variables is None:
        variables = jax.jit(detector.init)(rng, sample_images)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats,
                      opt_state=tx.init(params))


def normalize_images(images, norm: dict):
    """Device-side image normalization (the pipeline ``Normalize`` step
    moved inside the jitted program): raw uint8 BGR batches cross PCIe at
    1/4 the bytes and the subtract/scale fuses into the stem conv's input.
    ``norm`` is the config's ``img_norm_cfg`` (mean/std in BGR order like
    mmcv's, ``to_rgb`` flips the channel axis first)."""
    x = images.astype(jnp.float32)
    if norm.get('to_rgb', True):
        x = x[..., ::-1]
    mean = jnp.asarray(norm['mean'], jnp.float32)
    inv_std = 1.0 / jnp.asarray(norm['std'], jnp.float32)
    return (x - mean) * inv_std


def make_train_step(detector, tx, loss_weights: Optional[Dict] = None,
                    norm_eval: bool = True,
                    device_norm: Optional[dict] = None):
    """Returns the pure train-step fn; jit it with sharded-batch in_shardings
    for multi-chip data parallelism.

    ``norm_eval=False`` (reference ``norm_eval`` backbone flag) applies the
    model with a mutable ``batch_stats`` collection: every BatchNorm runs on
    batch statistics and EMA-updates its running stats, which are carried in
    the TrainState.

    ``device_norm``: img_norm_cfg dict when the host pipeline's Normalize
    was stripped (``datasets.loader.strip_host_normalize``) — the batch then
    arrives as raw uint8 and is normalized here, on device.
    """

    def train_step(state: TrainState, batch, rng=None):
        if rng is None:
            rng = jax.random.fold_in(jax.random.PRNGKey(0), state.step)
        images = batch['images']
        if device_norm is not None:
            images = normalize_images(images, device_norm)

        def loss_fn(params):
            variables = {'params': params}
            if state.batch_stats:
                variables['batch_stats'] = state.batch_stats
            if not norm_eval:
                outputs, updated = detector.apply(
                    variables, images, batch=batch, train=True,
                    rng=rng, mutable=['batch_stats'])
                new_stats = updated['batch_stats']
            else:
                outputs = detector.apply(variables, images,
                                         batch=batch, train=True, rng=rng)
                new_stats = state.batch_stats
            losses = detector.loss_from_outputs(outputs, batch)
            total = sum(jnp.asarray(v) for v in losses.values())
            return total, (losses, new_stats)

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               batch_stats=new_stats,
                               opt_state=opt_state)
        metrics = dict(losses, loss=total,
                       grad_norm=optax.global_norm(grads))
        return new_state, metrics

    return train_step
