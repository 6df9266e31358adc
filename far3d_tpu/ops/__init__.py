from .msda import msda, msda_xla
from .grid_mask import grid_mask
