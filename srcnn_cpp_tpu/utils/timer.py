"""Millisecond wall-clock timing (the reference's tick module).

The reference brackets its compute span with ``tick::getTickCount()`` —
milliseconds since static init via gettimeofday (reference src/tick.cpp:28-37,
used at src/srcnn.cpp:505,659).  Here: a monotonic-clock equivalent plus a
context-manager for per-stage spans.
"""

from __future__ import annotations

import time

_T0 = time.monotonic()


def tick_ms() -> int:
    """Milliseconds since module import (reference tick semantics)."""
    return int((time.monotonic() - _T0) * 1000.0)


class TickTimer:
    """Context manager measuring one span in milliseconds.

    >>> with TickTimer() as t:
    ...     work()
    >>> t.ms
    """

    def __init__(self) -> None:
        self.ms = 0.0

    def __enter__(self) -> "TickTimer":
        self._start = time.monotonic()
        return self

    def __exit__(self, *exc) -> None:
        self.ms = (time.monotonic() - self._start) * 1000.0
