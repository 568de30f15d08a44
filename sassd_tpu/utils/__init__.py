from . import cache, logging_utils, timer  # noqa: F401
