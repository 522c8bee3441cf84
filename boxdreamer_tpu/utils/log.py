"""Logging aliases (reference src/utils/log.py:1-7 loguru shims) on stdlib
logging, with the same INFO/WARNING/ERROR/DEBUG call surface."""

from __future__ import annotations

import logging
import sys

_logger = logging.getLogger("boxdreamer_tpu")
if not _logger.handlers:
    _handler = logging.StreamHandler(sys.stderr)
    _handler.setFormatter(
        logging.Formatter(
            "%(asctime)s | %(levelname)-7s | %(message)s", datefmt="%H:%M:%S"
        )
    )
    _logger.addHandler(_handler)
    _logger.setLevel(logging.INFO)
    _logger.propagate = False


def INFO(msg, *args):
    _logger.info(msg, *args)


def WARNING(msg, *args):
    _logger.warning(msg, *args)


def ERROR(msg, *args):
    _logger.error(msg, *args)


def DEBUG(msg, *args):
    _logger.debug(msg, *args)


def CRITICAL(msg, *args):
    _logger.critical(msg, *args)
