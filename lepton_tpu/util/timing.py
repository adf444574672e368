"""Stage-level timing harness (reference TimingHarness, jpgcoder.hh:25-56).

Named stage edges recorded per operation; printed at exit when
LEPTON_TIMING is set or via print_timing().
"""
from __future__ import annotations

import os
import sys
import time
from typing import Dict, List, Tuple

_events: List[Tuple[str, float]] = []
_enabled = bool(os.environ.get("LEPTON_TIMING"))


def enable(on: bool = True) -> None:
    global _enabled
    _enabled = on


def mark(stage: str) -> None:
    if _enabled:
        _events.append((stage, time.perf_counter()))


class stage:
    """Context manager marking STAGE_BEGIN/STAGE_END edges."""

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        mark(self.name + "_BEGIN")
        return self

    def __exit__(self, *exc):
        mark(self.name + "_END")
        return False


def print_timing(file=None) -> None:
    file = file or sys.stderr
    if not _events:
        return
    t0 = _events[0][1]
    spans: Dict[str, float] = {}
    begins: Dict[str, float] = {}
    for name, t in _events:
        if name.endswith("_BEGIN"):
            begins[name[:-6]] = t
        elif name.endswith("_END") and name[:-4] in begins:
            base = name[:-4]
            spans[base] = spans.get(base, 0.0) + (t - begins.pop(base))
    for name, t in _events:
        file.write(f"{name:<32}{(t - t0) * 1e6:>12.0f} us\n")
    for name, dt in sorted(spans.items(), key=lambda kv: -kv[1]):
        file.write(f"  [{name}] {dt * 1e3:.2f} ms\n")


def reset() -> None:
    _events.clear()
