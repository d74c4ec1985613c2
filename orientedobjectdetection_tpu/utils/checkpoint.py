"""Checkpoint save/restore + auto-resume.

Replaces mmcv's CheckpointHook / runner.resume (reference
``apis/train.py:134-143``, ``utils/misc.py:7-39``). Uses flax msgpack
serialization (handles arbitrary pytrees incl. optax states) with atomic
rename; latest-checkpoint discovery mirrors ``find_latest_checkpoint``.
"""

from __future__ import annotations

import os
import os.path as osp
import re
from typing import Any, Optional

import jax
from flax import serialization


def _ckpt_path(work_dir: str, step: int, prefix: str = 'ckpt') -> str:
    return osp.join(osp.abspath(work_dir), f'{prefix}_{step:08d}.msgpack')


def save_checkpoint(work_dir: str, state, step: int, keep: int = 3,
                    prefix: str = 'ckpt') -> str:
    """``prefix='best'`` saves a best-mAP checkpoint outside the rotation
    (the reference EvalHook's ``save_best`` behavior)."""
    os.makedirs(work_dir, exist_ok=True)
    payload = state._asdict() if hasattr(state, '_asdict') else state
    payload = jax.device_get(payload)
    path = _ckpt_path(work_dir, step, prefix)
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        f.write(serialization.to_bytes(payload))
    os.replace(tmp, path)  # atomic
    if prefix == 'ckpt':
        for old in find_checkpoints(work_dir)[:-keep]:
            os.remove(old)
    else:
        # keep only the newest checkpoint of this prefix
        stale = [osp.join(osp.abspath(work_dir), n)
                 for n in os.listdir(work_dir)
                 if re.fullmatch(rf'{prefix}_\d{{8}}\.msgpack', n)]
        for old in sorted(stale)[:-1]:
            os.remove(old)
    return path


def find_checkpoints(work_dir: str):
    if not osp.isdir(work_dir):
        return []
    out = [osp.join(osp.abspath(work_dir), n) for n in os.listdir(work_dir)
           if re.fullmatch(r'ckpt_\d{8}\.msgpack', n)]
    return sorted(out)


def find_latest_checkpoint(work_dir: str) -> Optional[str]:
    ckpts = find_checkpoints(work_dir)
    return ckpts[-1] if ckpts else None


def load_checkpoint(path: str, target: Any):
    """Restore into the structure of ``target`` (TrainState / pytree)."""
    tgt = target._asdict() if hasattr(target, '_asdict') else target
    with open(path, 'rb') as f:
        restored = serialization.from_bytes(tgt, f.read())
    if hasattr(target, '_asdict'):
        return type(target)(**restored)
    return restored
