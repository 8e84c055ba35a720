from . import linalg, linesearch
