from . import masks
