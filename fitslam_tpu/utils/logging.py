"""Leveled ANSI-colored logging.

Mirrors the reference's logger macros LOG_TRACE..LOG_FATAL + LOG_FLOW /
LOG_HIGHLIGHT with a compile-time LOG_LEVEL
(frontier_exploration/include/.../util/logger.hpp:48-139). Level is set via
env FITSLAM_LOG_LEVEL or set_level().
"""

from __future__ import annotations

import os
import sys
import time

TRACE, DEBUG, INFO, WARN, ERROR, FATAL = 0, 1, 2, 3, 4, 5
_NAMES = ["TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL"]
_COLORS = ["\033[90m", "\033[36m", "\033[32m", "\033[33m", "\033[31m", "\033[41m"]
_RESET = "\033[0m"

_level = {"TRACE": 0, "DEBUG": 1, "INFO": 2, "WARN": 3, "ERROR": 4, "FATAL": 5}.get(
    os.environ.get("FITSLAM_LOG_LEVEL", "INFO").upper(), INFO
)
_t0 = time.monotonic()
_use_color = sys.stderr.isatty()


def set_level(level: int):
    global _level
    _level = level


def _log(level: int, msg: str):
    if level < _level:
        return
    stamp = f"{time.monotonic() - _t0:9.3f}"
    tag = _NAMES[level]
    if _use_color:
        print(f"{_COLORS[level]}[{tag:<5} {stamp}] {msg}{_RESET}", file=sys.stderr)
    else:
        print(f"[{tag:<5} {stamp}] {msg}", file=sys.stderr)


def trace(msg: str):
    _log(TRACE, msg)


def debug(msg: str):
    _log(DEBUG, msg)


def info(msg: str):
    _log(INFO, msg)


def warn(msg: str):
    _log(WARN, msg)


def error(msg: str):
    _log(ERROR, msg)


def fatal(msg: str):
    _log(FATAL, msg)


def flow(msg: str):
    """High-visibility control-flow marker (reference: LOG_FLOW)."""
    if _level <= INFO:
        prefix = "\033[35m" if _use_color else ""
        suffix = _RESET if _use_color else ""
        print(f"{prefix}[FLOW  {time.monotonic() - _t0:9.3f}] {msg}{suffix}", file=sys.stderr)


def highlight(msg: str):
    if _level <= INFO:
        prefix = "\033[1;33m" if _use_color else ""
        suffix = _RESET if _use_color else ""
        print(f"{prefix}[HIGH  {time.monotonic() - _t0:9.3f}] {msg}{suffix}", file=sys.stderr)
