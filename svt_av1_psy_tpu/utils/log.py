"""Leveled logging (the svt_log.c analog, ref Source/Lib/Codec/svt_log.c:30).

Level from the SVT_LOG env var (like the reference):
  0 = fatal only, 1 = +error, 2 = +warn, 3 = +info (default), 4 = +debug
Destination stderr, or the file named by SVT_LOG_FILE.
"""
from __future__ import annotations

import os
import sys
import threading

FATAL, ERROR, WARN, INFO, DEBUG = 0, 1, 2, 3, 4
_NAMES = {FATAL: "fatal", ERROR: "error", WARN: "warn",
          INFO: "info", DEBUG: "debug"}

_lock = threading.Lock()
_level = None
_sink = None


def _init():
    global _level, _sink
    if _level is not None:
        return
    try:
        _level = int(os.environ.get("SVT_LOG", INFO))
    except ValueError:
        _level = INFO
    path = os.environ.get("SVT_LOG_FILE")
    if path:
        try:
            _sink = open(path, "a")
        except OSError:
            _sink = sys.stderr
    else:
        _sink = sys.stderr


def set_level(level: int) -> None:
    global _level
    _init()
    _level = level


def log(level: int, msg: str, *args) -> None:
    _init()
    if level > _level:
        return
    if args:
        msg = msg % args
    with _lock:
        print(f"Svt[{_NAMES.get(level, '?')}]: {msg}",
              file=_sink, flush=True)


def debug(msg: str, *args) -> None:
    log(DEBUG, msg, *args)


def info(msg: str, *args) -> None:
    log(INFO, msg, *args)


def warn(msg: str, *args) -> None:
    log(WARN, msg, *args)


def error(msg: str, *args) -> None:
    log(ERROR, msg, *args)
