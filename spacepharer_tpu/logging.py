"""Logging, verbosity and stage timing.

Parity-inspired by the reference's Debug levels 0-3 (-v flag,
lib/mmseqs/src/commons/Debug.h:46-48) and per-command wall-time
reporting (Application.cpp:36-40), with a structured twist: timings are
also collected machine-readably per stage.
"""
import sys
import time

QUIET = 0
ERROR = 1
WARNING = 2
INFO = 3

_verbosity = INFO
_timings = {}


def set_verbosity(level: int):
    global _verbosity
    _verbosity = level


def log(level: int, *msg):
    if level <= _verbosity:
        print(*msg, file=sys.stderr if level <= WARNING else sys.stdout)


def info(*msg):
    log(INFO, *msg)


def warn(*msg):
    log(WARNING, *msg)


class stage_timer:
    """with stage_timer("search"): ... — records and reports wall time."""

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self.t0
        _timings[self.name] = _timings.get(self.name, 0.0) + dt
        info(f"Time for {self.name}: {dt:.3f}s")
        return False


def timings() -> dict:
    return dict(_timings)
