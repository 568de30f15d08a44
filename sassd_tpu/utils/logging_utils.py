"""Logger setup (console + timestamped file, non-zero hosts silenced).

Equivalent of get_root_logger (/root/reference/tools/env.py:48-64).
"""
from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Optional

import jax


def get_root_logger(work_dir: Optional[str] = None,
                    level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger("sassd")
    if logger.handlers:
        return logger
    logger.setLevel(level)
    fmt = logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
    if jax.process_index() == 0:
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if work_dir:
            Path(work_dir).mkdir(parents=True, exist_ok=True)
            ts = time.strftime("%Y%m%d_%H%M%S", time.localtime())
            fh = logging.FileHandler(str(Path(work_dir) / f"{ts}.log"))
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    else:
        logger.addHandler(logging.NullHandler())
        logger.propagate = False
    return logger
