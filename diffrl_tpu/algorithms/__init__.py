from .shac import SHAC
