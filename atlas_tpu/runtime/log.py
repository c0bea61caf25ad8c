"""Logging channels (reference: atlas runtime/Log.h — info/warning/error/debug
with env-var gating, library/Library.cc:325-350)."""

from __future__ import annotations

import logging
import os

_logger = logging.getLogger("atlas_tpu")
if not _logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("[atlas_tpu] %(levelname)s: %(message)s"))
    _logger.addHandler(_h)
_level = os.environ.get("ATLAS_TPU_LOG", "INFO").upper()
_logger.setLevel(getattr(logging, _level, logging.INFO))
if os.environ.get("ATLAS_TPU_DEBUG", "0") not in ("0", "", "false"):
    _logger.setLevel(logging.DEBUG)


class Log:
    @staticmethod
    def info(*args):
        _logger.info(" ".join(str(a) for a in args))

    @staticmethod
    def warning(*args):
        _logger.warning(" ".join(str(a) for a in args))

    @staticmethod
    def error(*args):
        _logger.error(" ".join(str(a) for a in args))

    @staticmethod
    def debug(*args):
        _logger.debug(" ".join(str(a) for a in args))
