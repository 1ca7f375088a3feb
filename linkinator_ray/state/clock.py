"""Clock abstraction: the round loop's notion of time.

The reference schedules delayed work (Retry-After, backoff) on a
single-wakeup timer wheel (/root/reference/src/queue.ts:115-145); its
tests replace timers with fake clocks (test/test.retry.ts:49-57). Here
the round loop *is* the clock: deferred frontier rows carry a
``not_before`` timestamp, and when a round has no runnable rows the
clock jumps (fake) or sleeps (real) to the earliest deadline.
"""

from __future__ import annotations

import time


class Clock:
    """Wall clock (production)."""

    def now(self) -> float:
        return time.time()

    def advance_to(self, deadline: float) -> None:
        delta = deadline - self.now()
        if delta > 0:
            time.sleep(delta)


class FakeClock(Clock):
    """Deterministic manual clock for tests and the mock-latency bench."""

    def __init__(self, start: float = 1_000_000.0):
        self._now = start

    def now(self) -> float:
        return self._now

    def advance(self, seconds: float) -> None:
        self._now += seconds

    def advance_to(self, deadline: float) -> None:
        if deadline > self._now:
            self._now = deadline
