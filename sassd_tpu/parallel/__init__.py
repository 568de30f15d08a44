from . import mesh  # noqa: F401
from . import spatial  # noqa: F401
