"""Logging with an extra PERF level.

Reference parity: devito/logger.py (custom PERF level 19, colored output,
``set_log_level``). TPU build keeps the same level map; rank-restriction is
a no-op on a single controller (JAX is single-controller SPMD).
"""

import logging
import sys

__all__ = ['logger', 'set_log_level', 'log', 'info', 'perf', 'warning',
           'error', 'debug', 'PERF', 'DEBUG', 'INFO', 'WARNING', 'ERROR']

DEBUG = logging.DEBUG
PERF = 19
INFO = logging.INFO
WARNING = logging.WARNING
ERROR = logging.ERROR

logging.addLevelName(PERF, "PERF")

logger_registry = {
    'DEBUG': DEBUG, 'PERF': PERF, 'INFO': INFO,
    'WARNING': WARNING, 'ERROR': ERROR,
}

logger = logging.getLogger('DevitoTPU')
_ch = logging.StreamHandler(stream=sys.stdout)
logger.addHandler(_ch)
logger.setLevel(INFO)

COLORS = {
    DEBUG: '\033[90m', PERF: '\033[32m', INFO: '',
    WARNING: '\033[33m', ERROR: '\033[31m',
}
RESET = '\033[0m'


def set_log_level(level):
    """Set the log level; accepts an int or a name in ``logger_registry``."""
    if isinstance(level, str):
        level = logger_registry[level.upper()]
    logger.setLevel(level)


def log(msg, level=INFO, *args, **kwargs):
    color = COLORS.get(level, '')
    logger.log(level, f"{color}{msg}{RESET if color else ''}", *args, **kwargs)


def info(msg, *args, **kwargs):
    log(msg, INFO, *args, **kwargs)


def perf(msg, *args, **kwargs):
    log(msg, PERF, *args, **kwargs)


def warning(msg, *args, **kwargs):
    log(msg, WARNING, *args, **kwargs)


def error(msg, *args, **kwargs):
    log(msg, ERROR, *args, **kwargs)


def debug(msg, *args, **kwargs):
    log(msg, DEBUG, *args, **kwargs)
