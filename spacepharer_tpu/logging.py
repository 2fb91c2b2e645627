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


class Progress:
    """Operator progress feedback (Debug::Progress,
    lib/mmseqs/src/commons/Debug.h:115-200): an interactive terminal
    gets an in-place bar; a non-tty stream gets '[' + one '=' per bar
    step and a closing '] N items  (t s)' line, so long createsetdb /
    search stages are visibly alive in both logs and terminals.
    Thread-safe ticks; respects the -v level (INFO and up)."""

    BARWIDTH = 65

    def __init__(self, total=None, label: str = ""):
        import threading
        self.total = total
        self.label = label
        self.n = 0
        self._printed = 0          # bar cells already emitted (non-tty)
        self._lock = threading.Lock()
        self._t0 = time.perf_counter()
        self._last_draw = 0.0
        self._enabled = _verbosity >= INFO
        self._tty = sys.stderr.isatty()
        self._opened = False

    def update(self, n: int = 1):
        if not self._enabled:
            return
        with self._lock:
            self.n += n
            now = time.perf_counter()
            if self._tty:
                if now - self._last_draw < 0.1:
                    return
                self._last_draw = now
                if self.total:
                    frac = min(self.n / self.total, 1.0)
                    fill = int(frac * self.BARWIDTH)
                    bar = "=" * fill + (">" if fill < self.BARWIDTH else "")
                    sys.stderr.write(
                        f"\r{self.label}[{bar:<{self.BARWIDTH}}] "
                        f"{self.n}/{self.total} {frac * 100:5.1f}%")
                else:
                    sys.stderr.write(f"\r{self.label}[{self.n} items]")
                sys.stderr.flush()
            else:
                if not self._opened:
                    sys.stderr.write(self.label + "[")
                    self._opened = True
                if self.total:
                    want = int(min(self.n / self.total, 1.0) * self.BARWIDTH)
                else:
                    want = self.n // 10000
                if want > self._printed:
                    sys.stderr.write("=" * (want - self._printed))
                    sys.stderr.flush()
                    self._printed = want

    def done(self):
        if not self._enabled:
            return
        dt = time.perf_counter() - self._t0
        label = self.label
        if self._tty:
            sys.stderr.write("\r\033[K")
        elif self._opened:
            # the open bar line already carries the label
            sys.stderr.write("] ")
            label = ""
        elif self.n == 0:
            return
        sys.stderr.write(f"{label}{self.n} items  ({dt:.2f}s)\n")
        sys.stderr.flush()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.done()
        return False


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
