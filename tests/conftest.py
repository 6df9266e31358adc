import os

# Run all tests on a virtual 8-device CPU mesh (the JAX equivalent of a fake
# cluster; the reference has no non-distributed test path at all).
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
# persistent compile cache: per-primitive eager compiles are very slow in this
# environment, so tests jit whole graphs and cache them across runs.
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_test_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
