import os

# Run all tests on a virtual 8-device CPU mesh (the JAX equivalent of a fake
# cluster; the reference has no non-distributed test path at all).
#
# NOTE: this environment force-registers a TPU ('axon') PJRT backend from
# sitecustomize and presets JAX_PLATFORMS=axon, so the env var alone is not
# enough — jax.config must be updated before the backend initializes.
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_test_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
