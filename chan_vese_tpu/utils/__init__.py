"""I/O, init, traces, checkpoints, profiling."""

from .init_phi import checkerboard, circle, init_phi, rect
from . import checkpoint, image_io, profiling, trace

__all__ = ["init_phi", "checkerboard", "circle", "rect",
           "image_io", "trace", "checkpoint", "profiling"]
