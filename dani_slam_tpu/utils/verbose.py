"""Leveled logger — the Verbose::PrintMess analogue.

Reference: include/System.h:47-72 defines a static Verbose class with
VERBOSITY_QUIET/NORMAL/VERBOSE/VERY_VERBOSE/DEBUG levels consumed all over
Tracking/LocalMapping/LoopClosing; System.cc:250 sets QUIET by default.
Same shape here: a module-level threshold, print-if-at-least. Runners set
NORMAL; the library itself defaults QUIET so tests and embedding apps stay
silent (the reference's default too).
"""
from __future__ import annotations

import sys

QUIET = 0
NORMAL = 1
VERBOSE = 2
VERY_VERBOSE = 3
DEBUG = 4

_level = QUIET


def set_verbosity(level: int) -> None:
    """Set the global threshold (reference: Verbose::SetTh)."""
    global _level
    _level = int(level)


def get_verbosity() -> int:
    return _level


def print_mess(msg: str, level: int = NORMAL, *, file=None) -> None:
    """Print `msg` when the global threshold admits `level`
    (reference: Verbose::PrintMess, System.h:56-63)."""
    if _level >= level:
        print(msg, file=file or sys.stderr, flush=True)
