from .shac import SHAC
from .bptt import BPTT
