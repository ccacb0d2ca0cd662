"""Test configuration: force an 8-virtual-device CPU platform so sharding logic is
exercised without TPU hardware (SURVEY.md §4 test strategy)."""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8'
    ).strip()
os.environ.setdefault('JAX_ENABLE_X64', '0')
