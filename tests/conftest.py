"""Test configuration: force an 8-virtual-device CPU platform so sharding logic is
exercised without TPU hardware (SURVEY.md §4 test strategy).

NOTE: this image's sitecustomize imports jax at interpreter boot (axon TPU tunnel),
so env vars set here are too late — use jax.config.update, which works as long as
no backend has been initialized yet.
"""

import os

if os.environ.get('TMAE_TPU_TESTS'):
    # opt-out for @pytest.mark.tpu runs: keep whatever backend the image
    # attaches (the axon TPU) — TMAE_TPU_TESTS=1 python -m pytest -m tpu
    pass
else:
    flags = os.environ.get('XLA_FLAGS', '')
    if 'xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=8'
        ).strip()
    os.environ['JAX_PLATFORMS'] = 'cpu'

    import jax

    jax.config.update('jax_platforms', 'cpu')
