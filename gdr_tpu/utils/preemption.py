"""Preemption-safe training: graceful shutdown on SIGTERM/SIGINT.

The reference has no failure handling at all — a DDP crash kills the job and
recovery is a manual ``--resume_from_checkpoint`` (SURVEY.md §5).  TPU pods
are preempted routinely, so the loop here treats it as a first-class event:
a signal flips a flag, the loop finishes the current step, writes a resume
checkpoint, and exits cleanly; the next start restores from it.
"""

from __future__ import annotations

import signal
import threading
from typing import Iterable


class PreemptionGuard:
    """Install once, poll ``should_stop`` between steps."""

    def __init__(self, signals: Iterable[int] = (signal.SIGTERM,
                                                 signal.SIGINT)):
        self._stop = threading.Event()
        self._prev = {}
        self._signals = tuple(signals)

    def __enter__(self) -> "PreemptionGuard":
        for sig in self._signals:
            self._prev[sig] = signal.signal(sig, self._handler)
        return self

    def __exit__(self, *exc) -> None:
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
        self._prev.clear()

    def _handler(self, signum, frame) -> None:
        self._stop.set()

    @property
    def should_stop(self) -> bool:
        return self._stop.is_set()

    def request_stop(self) -> None:
        """Programmatic preemption (tests, external watchers)."""
        self._stop.set()
