"""Test config: force an 8-device virtual CPU mesh before JAX backends init.

The reference's tests are GPU-gated (its mmcv rotated ops have no CPU
fallback — SURVEY.md §4); ours run everywhere, and multi-device sharding is
tested on a virtual 8-device CPU mesh.

Note: this image's axon TPU plugin overrides the ``JAX_PLATFORMS`` env var
(config resolves to "axon,cpu" regardless), so we must also set the config
flag programmatically before any backend initializes.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')


# ---- slow-tier gating: `pytest tests/` stays fast by default; run the
# end-to-end convergence tier with --runslow (or RUN_SLOW=1) ----------------
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption('--runslow', action='store_true', default=False,
                     help='run slow end-to-end tests (synth convergence)')
    parser.addoption('--runtpu', action='store_true', default=False,
                     help='run opt-in real-TPU smoke tests (tests/test_tpu)')


def pytest_collection_modifyitems(config, items):
    run_slow = config.getoption('--runslow') or os.environ.get('RUN_SLOW')
    run_tpu = config.getoption('--runtpu') or os.environ.get('RUN_TPU')
    skip_slow = pytest.mark.skip(
        reason='slow tier: pass --runslow / RUN_SLOW=1')
    skip_tpu = pytest.mark.skip(
        reason='real-TPU tier: pass --runtpu / RUN_TPU=1')
    for item in items:
        if 'slow' in item.keywords and not run_slow:
            item.add_marker(skip_slow)
        if 'tpu' in item.keywords and not run_tpu:
            item.add_marker(skip_tpu)
