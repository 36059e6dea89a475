"""Colored console + per-experiment file logger (reference lib/utils/logger.py).

Rank-aware: only jax process 0 emits (the multi-host analog of the
reference's @master_only decorator, dist_utils.py:5-22).
"""

from __future__ import annotations

import logging
import os
import sys


_COLORS = {"DEBUG": "\033[36m", "INFO": "\033[32m", "WARNING": "\033[33m",
           "ERROR": "\033[31m", "CRITICAL": "\033[35m"}
_RESET = "\033[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        msg = super().format(record)
        color = _COLORS.get(record.levelname, "")
        return f"{color}{msg}{_RESET}" if sys.stderr.isatty() else msg


def _is_master() -> bool:
    try:
        import jax
        return jax.process_index() == 0
    except Exception:
        return True


class ExpLogger:
    """Singleton-ish logger; call set_log_file once the exp dir exists."""

    def __init__(self):
        self._log = logging.getLogger("color_neus_tpu")
        self._log.setLevel(logging.INFO)
        self._log.propagate = False
        if not self._log.handlers:
            h = logging.StreamHandler(sys.stderr)
            h.setFormatter(_ColorFormatter("%(asctime)s [%(levelname)s] %(message)s", "%H:%M:%S"))
            self._log.addHandler(h)
        self._file_handler = None

    def set_log_file(self, path: str):
        if not _is_master():
            return
        os.makedirs(os.path.dirname(path), exist_ok=True)
        if self._file_handler is not None:
            self._log.removeHandler(self._file_handler)
        self._file_handler = logging.FileHandler(path)
        self._file_handler.setFormatter(
            logging.Formatter("%(asctime)s [%(levelname)s] %(message)s"))
        self._log.addHandler(self._file_handler)

    def info(self, msg, *a):
        if _is_master():
            self._log.info(msg, *a)

    def warning(self, msg, *a):
        if _is_master():
            self._log.warning(msg, *a)

    def error(self, msg, *a):
        if _is_master():
            self._log.error(msg, *a)


logger = ExpLogger()
