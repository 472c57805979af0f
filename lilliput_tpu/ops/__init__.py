"""Device-side ops: resize, orientation, blend/compositing, color, codecs' kernels."""
from . import blend, orient, resize  # noqa: F401
