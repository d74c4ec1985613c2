"""Tests for the multi-process eval gather (`apis/eval._collect_results`)
— the equivalent of mmdet's ``multi_gpu_test`` + ``collect_results_cpu``
(reference ``tools/test.py:14``). Real multi-process JAX is unavailable in
tests, so rank 1's write phase is simulated by pre-placing its part file;
rank 0 then runs the full write→barrier→merge→cleanup path."""

import os
import pickle

import pytest

from orientedobjectdetection_tpu.apis import eval as eval_api


@pytest.fixture
def two_process(monkeypatch):
    """Pretend to be rank 0 of a 2-process job with barriers stubbed."""
    import jax
    from jax.experimental import multihost_utils
    monkeypatch.setattr(jax, 'process_count', lambda: 2)
    monkeypatch.setattr(jax, 'process_index', lambda: 0)
    monkeypatch.setattr(multihost_utils, 'sync_global_devices',
                        lambda name: None)
    monkeypatch.setattr(eval_api, '_GATHER_ROUND', [0])


def _write_part(collect_dir, round_idx, rank, indices, results):
    round_dir = os.path.join(collect_dir, f'round_{round_idx}')
    os.makedirs(round_dir, exist_ok=True)
    with open(os.path.join(round_dir, f'part_{rank}.pkl'), 'wb') as f:
        pickle.dump((indices, results), f)


def test_gather_interleaves_and_cleans_up(two_process, tmp_path):
    collect = str(tmp_path / 'gather')
    # rank 1 owns the odd interleaved slice (batched_eval: i % n_proc == r)
    _write_part(collect, 0, 1, [1, 3], ['img1', 'img3'])
    merged = eval_api._collect_results(['img0', 'img2'], [0, 2], 4,
                                       collect_dir=collect)
    assert merged == ['img0', 'img1', 'img2', 'img3']
    # rank 0 deletes the round dir after the read barrier
    assert not os.path.exists(os.path.join(collect, 'round_0'))


def test_gather_fresh_dir_per_round(two_process, tmp_path):
    """Repeated calls (per-epoch eval) must not reuse part files from a
    previous round (round-2 ADVICE: fixed dir + fixed names could mix a
    fast writer's round k+1 with a slow reader's round k)."""
    collect = str(tmp_path / 'gather')
    _write_part(collect, 0, 1, [1], ['e0-r1'])
    first = eval_api._collect_results(['e0-r0'], [0], 2, collect_dir=collect)
    _write_part(collect, 1, 1, [1], ['e1-r1'])
    second = eval_api._collect_results(['e1-r0'], [0], 2,
                                       collect_dir=collect)
    assert first == ['e0-r0', 'e0-r1']
    assert second == ['e1-r0', 'e1-r1']


def test_gather_requires_shared_dir_multiprocess(two_process):
    """tempdir is per-host on multi-host pods — defaulting silently would
    gather stale/missing parts (round-2 ADVICE item)."""
    with pytest.raises(ValueError, match='SHARED'):
        eval_api._collect_results(['x'], [0], 2, collect_dir=None)


def test_gather_matches_single_process_eval(two_process, tmp_path):
    """Result-list equality: interleaved two-process gather == the identity
    ordering a single process produces."""
    import numpy as np
    full = [[np.full((1, 6), i)] for i in range(6)]
    collect = str(tmp_path / 'gather')
    _write_part(collect, 0, 1, [1, 3, 5], [full[1], full[3], full[5]])
    merged = eval_api._collect_results([full[0], full[2], full[4]],
                                       [0, 2, 4], 6, collect_dir=collect)
    assert all((a[0] == b[0]).all() for a, b in zip(merged, full))
