"""Leveled logging (host-framework Logging.Logger equivalent,
reference usage: Model.py:13 etc.)."""

from __future__ import annotations

import logging
import sys

_logger = logging.getLogger('fastergs_tpu')
if not _logger.handlers:
    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(logging.Formatter('[%(levelname)s] %(message)s'))
    _logger.addHandler(handler)
    _logger.setLevel(logging.INFO)
    _logger.propagate = False


def log_info(msg: str) -> None:
    _logger.info(msg)


def log_warning(msg: str) -> None:
    _logger.warning(msg)


def log_error(msg: str) -> None:
    _logger.error(msg)


def set_log_level(level: int) -> None:
    """0: errors, 1: warnings, 2: info (host GLOBAL.LOG_LEVEL convention)."""
    _logger.setLevel({0: logging.ERROR, 1: logging.WARNING}.get(level, logging.INFO))
