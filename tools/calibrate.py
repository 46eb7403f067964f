"""Host-speed calibration for cross-round perf comparisons.

The per-round bench/audit numbers are only comparable across rounds if
the host is equally fast — and measured single-core throughput has
varied up to ~2x between round hosts (r4 -> r5: CPU-bound lanes
uniformly +50-100% with zero code changes). This fixed, deterministic
single-core workload gives every artifact a denominator: before
reading a cross-round delta as a regression, scale one round's
numbers by the ratio of the two rounds' calibration values.
"""

from __future__ import annotations

import hashlib
import time


def py_calibration_ms(n: int = 1_000_000) -> float:
    """Milliseconds to md5-fold ``n`` short byte strings on one core.

    Pure CPython + hashlib: no JIT warm-up, no allocation cliffs, same
    work every call — a stable proxy for the single-core speed that
    bounds both the Python kernels and (roughly) the JVM codegen
    loops. Best-of-3 to shed scheduler noise.
    """
    best = float("inf")
    for _ in range(3):
        h = hashlib.md5()
        t0 = time.perf_counter()
        for i in range(n):
            h.update(b"%d" % i)
        best = min(best, time.perf_counter() - t0)
    return round(best * 1000, 1)
