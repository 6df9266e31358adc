from setuptools import find_packages, setup

setup(
    name='far3d-tpu',
    version='0.1.0',
    description=('TPU-native (JAX/XLA/Pallas) sparse-query long-range '
                 'surround-view 3D detection'),
    packages=find_packages(include=['far3d_tpu*']),
    python_requires='>=3.10',
    install_requires=['jax', 'flax', 'optax', 'orbax-checkpoint', 'numpy'],
    extras_require={
        'data': ['opencv-python', 'pandas', 'pyarrow'],
        'test': ['pytest', 'scipy'],
    },
)
