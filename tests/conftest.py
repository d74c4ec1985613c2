"""Test config: force an 8-device virtual CPU mesh before JAX is imported.

The reference's tests are GPU-gated (its mmcv rotated ops have no CPU
fallback — SURVEY.md §4); ours run everywhere, and multi-device sharding is
tested on a virtual CPU mesh (the standard
``xla_force_host_platform_device_count`` trick).
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
