from . import core, scaling
