"""far3d-tpu: TPU-native (JAX/XLA/Pallas) sparse-query long-range 3D detection.

A ground-up rebuild of the capabilities of megvii-research/Far3D (AAAI 2024)
for TPU: camera-only surround-view 3D detection on Argoverse 2.
"""

from .config import Far3DConfig, tiny_test_config
from .models.detector import Far3D, decode_detections
from .models.farhead import TemporalState, init_state

__version__ = '0.1.0'
__all__ = ['Far3DConfig', 'tiny_test_config', 'Far3D', 'decode_detections',
           'TemporalState', 'init_state']
