from . import logging_utils, timer  # noqa: F401
