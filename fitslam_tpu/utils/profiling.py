"""EventLogger-equivalent profiling.

Mirrors the reference's EventLogger singleton + RAII Profiler
(frontier_exploration/include/.../util/event_logger.hpp:20-82,
src/util/event_logger.cpp:27-97): named start/end events at four severity
tiers (iteration / module / submodule / event), wall-clock accumulation,
`time_since_start` usable as a scheduling timer, and CSV export (which the
reference ships but leaves commented out — here it works).

Device-time caveat: JAX dispatch is async; scopes that must measure device
work should pass `block_on=<output>` so the result is synchronized via
`device_sync` before the timer stops.
"""

from __future__ import annotations

import csv
import io
import time
from collections import defaultdict
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax

ITERATION, MODULE, SUBMODULE, EVENT = 0, 1, 2, 3
_TIER_NAMES = {ITERATION: "iteration", MODULE: "module", SUBMODULE: "submodule", EVENT: "event"}


def device_sync(x) -> None:
    """TRUE device synchronization barrier on `x` (array or pytree).

    On this environment's remote TPU runtime, ``jax.block_until_ready``
    returns once the dispatch is acknowledged — NOT when execution
    completes (measured: a compute chain taking 14 s "blocked" in 20 ms).
    Every wall-clock measurement that stops its timer on block_until_ready
    therefore measures dispatch throughput, not compute. The only reliable
    barrier is a device->host readback of a value that data-depends on the
    pending work; this helper pulls one scalar per array leaf.
    """
    import numpy as _np

    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "dtype") and getattr(leaf, "size", 0):
            _np.asarray(leaf.reshape(-1)[0])


@dataclass
class _Stat:
    count: int = 0
    total_s: float = 0.0
    min_s: float = float("inf")
    max_s: float = 0.0
    last_s: float = 0.0

    def add(self, dt: float):
        self.count += 1
        self.total_s += dt
        self.min_s = min(self.min_s, dt)
        self.max_s = max(self.max_s, dt)
        self.last_s = dt

    @property
    def mean_s(self) -> float:
        return self.total_s / max(self.count, 1)


@dataclass
class EventLogger:
    """Accumulating wall-clock profiler. One instance per engine; cheap."""

    time_tier: int = MODULE          # suppress tiers below this (TIME_LEVEL analog)
    verbose: bool = False
    stats: Dict[str, _Stat] = field(default_factory=lambda: defaultdict(_Stat))
    _open: Dict[str, float] = field(default_factory=dict)
    _t0: float = field(default_factory=time.monotonic)

    def start(self, name: str):
        self._open[name] = time.monotonic()

    def end(self, name: str, tier: int = EVENT):
        t0 = self._open.pop(name, None)
        if t0 is None:
            return 0.0
        dt = time.monotonic() - t0
        if tier <= self.time_tier:
            self.stats[name].add(dt)
            if self.verbose:
                print(f"[{_TIER_NAMES[tier]}] {name}: {dt * 1e3:.2f} ms")
        return dt

    @contextmanager
    def scope(self, name: str, tier: int = EVENT, block_on=None):
        """RAII profiling scope (reference: PROFILE_FUNCTION macro)."""
        t0 = time.monotonic()
        try:
            yield
        finally:
            if block_on is not None:
                device_sync(block_on)
            dt = time.monotonic() - t0
            if tier <= self.time_tier:
                self.stats[name].add(dt)
                if self.verbose:
                    print(f"[{_TIER_NAMES[tier]}] {name}: {dt * 1e3:.2f} ms")

    def time_since_start(self) -> float:
        """Scheduling timer (reference: getTimeSinceStart, used by BT nodes)."""
        return time.monotonic() - self._t0

    def summary(self) -> str:
        lines = [f"{'name':<40}{'count':>7}{'mean ms':>10}{'min ms':>9}{'max ms':>9}{'total s':>9}"]
        for name in sorted(self.stats, key=lambda n: -self.stats[n].total_s):
            s = self.stats[name]
            lines.append(
                f"{name:<40}{s.count:>7}{s.mean_s * 1e3:>10.2f}{s.min_s * 1e3:>9.2f}"
                f"{s.max_s * 1e3:>9.2f}{s.total_s:>9.2f}"
            )
        return "\n".join(lines)

    def to_csv(self, path: Optional[str] = None) -> str:
        buf = io.StringIO()
        w = csv.writer(buf)
        w.writerow(["name", "count", "mean_ms", "min_ms", "max_ms", "total_s"])
        for name, s in sorted(self.stats.items()):
            w.writerow([name, s.count, s.mean_s * 1e3, s.min_s * 1e3, s.max_s * 1e3, s.total_s])
        text = buf.getvalue()
        if path:
            with open(path, "w") as f:
                f.write(text)
        return text

    def reset(self):
        self.stats.clear()
        self._open.clear()
        self._t0 = time.monotonic()


_GLOBAL: Optional[EventLogger] = None


def global_logger() -> EventLogger:
    global _GLOBAL
    if _GLOBAL is None:
        _GLOBAL = EventLogger()
    return _GLOBAL
