from .detector import Far3D, decode_detections
from .farhead import FarHead, TemporalState, init_state
from .vovnet import FPN, VoVNet
from .heads2d import YoloxHead2D, DepthPredictor
