"""Per-phase timers + iteration stats (reference mxx::section_timer / SAC_TIMER).

The reference instruments every construction phase with collective section
timers and prints per-iteration unfinished-bucket counts
(``include/suffix_array.hpp:44-63,318-319,415-417``).  Here a process-local
section timer wraps the host-staged loop: each section ends at a natural
device sync point (the loop's scalar readbacks), so wall times reflect real
device work.

Enable with ``PSAC_TIMER=1`` (or ``SectionTimer(enabled=True)``); output goes
to stderr as ``[timer] <name>: <ms> ms``.
"""

from __future__ import annotations

import os
import sys
import time


def timers_enabled() -> bool:
    return os.environ.get("PSAC_TIMER", "0") not in ("", "0", "false")


class SectionTimer:
    """Named wall-clock sections with an aggregate summary."""

    def __init__(self, label: str = "", enabled: bool | None = None,
                 stream=None):
        self.enabled = timers_enabled() if enabled is None else enabled
        self.label = label
        self.stream = stream or sys.stderr
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}
        self._t0 = time.perf_counter()

    def end_section(self, name: str) -> float:
        """Close the current section under ``name``; returns its seconds."""
        now = time.perf_counter()
        dt = now - self._t0
        self._t0 = now
        if self.enabled:
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1
            print(f"[timer]{self._pfx()} {name}: {dt * 1000:.2f} ms",
                  file=self.stream, flush=True)
        return dt

    def info(self, msg: str) -> None:
        if self.enabled:
            print(f"[timer]{self._pfx()} {msg}", file=self.stream, flush=True)

    def summary(self) -> None:
        if self.enabled and self.totals:
            total = sum(self.totals.values())
            print(f"[timer]{self._pfx()} ---- summary ({total * 1000:.2f} ms total)",
                  file=self.stream, flush=True)
            for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
                print(f"[timer]{self._pfx()}   {name}: {t * 1000:.2f} ms "
                      f"x{self.counts[name]}", file=self.stream, flush=True)

    def _pfx(self) -> str:
        return f" [{self.label}]" if self.label else ""
