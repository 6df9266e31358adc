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
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
# Persistent compile cache: jax 0.9.0 ignores the JAX_COMPILATION_CACHE_DIR
# env var — only the explicit config works (probed round 4). Without it every
# suite run recompiled everything from scratch (~1 h on this 1-vCPU box).
jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('FAR3D_TEST_CACHE', '/tmp/jax_test_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)
