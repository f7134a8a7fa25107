"""Logging: rotating-file + console singleton.

Reference analogue: common/logging.hpp:20-57 — singleton logger, levels
DEBUG..FATAL, console + file sinks, 100MB rotation x 10 files, async option.
Python's stdlib provides the machinery; this module pins the reference's
defaults and exposes the same surface.
"""

from __future__ import annotations

import logging
import logging.handlers
import os
import queue
import threading
from typing import Optional

_LOGGER_NAME = "deeppowers_tpu"
_MAX_BYTES = 100 * 1024 * 1024   # reference: 100MB rotation
_BACKUP_COUNT = 10               # reference: x10 files
_lock = threading.Lock()
_configured = False


def get_logger(name: Optional[str] = None) -> logging.Logger:
    _ensure_configured()
    return logging.getLogger(
        f"{_LOGGER_NAME}.{name}" if name else _LOGGER_NAME)


def configure(*, level: str = "INFO", log_file: Optional[str] = None,
              async_mode: bool = False) -> logging.Logger:
    """Configure the singleton (console always; file if log_file given;
    async via QueueHandler when async_mode)."""
    global _configured
    with _lock:
        logger = logging.getLogger(_LOGGER_NAME)
        logger.setLevel(getattr(logging, level.upper()))
        logger.handlers.clear()
        fmt = logging.Formatter(
            "%(asctime)s [%(levelname)s] %(name)s: %(message)s")
        handlers: list = [logging.StreamHandler()]
        if log_file:
            os.makedirs(os.path.dirname(os.path.abspath(log_file)),
                        exist_ok=True)
            handlers.append(logging.handlers.RotatingFileHandler(
                log_file, maxBytes=_MAX_BYTES, backupCount=_BACKUP_COUNT))
        for h in handlers:
            h.setFormatter(fmt)
        if async_mode:
            q: "queue.Queue" = queue.Queue(-1)
            listener = logging.handlers.QueueListener(q, *handlers)
            listener.daemon = True
            listener.start()
            logger.addHandler(logging.handlers.QueueHandler(q))
        else:
            for h in handlers:
                logger.addHandler(h)
        logger.propagate = False
        _configured = True
        return logger


def _ensure_configured() -> None:
    global _configured
    if not _configured:
        configure(level=os.environ.get("DEEPPOWERS_LOG_LEVEL", "INFO"))
