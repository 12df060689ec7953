"""Quiet-window calibration shared by the scaling probe and the
headline bench phase (no import side effects — scale_probe.py sets
OMP_NUM_THREADS for its own process; bench.py phase 1 must not)."""

from __future__ import annotations


def calibrate(cores: int) -> float:
    """Quiet-window detector: run `cores` concurrent single-thread
    numpy dot workloads (GIL released) across the visible core set and
    return the slowest thread's wall. On a quiet window this is a tight
    constant; a co-tenant burst on ANY core inflates it. Callers sample
    it before and after a timed run and treat the run as quiet only
    when both sit near the observed floor (noise here is one-sided)."""
    import threading
    import time

    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.random(2_000_000)
    walls = [0.0] * cores

    def work(i: int) -> None:
        # min of 2 reps per thread: a sub-20ms scheduler hiccup must not
        # reject the window — only sustained co-tenant load should
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            s = 0.0
            for _ in range(12):
                s += float(np.dot(a, a))
            best = min(best, time.perf_counter() - t0)
        walls[i] = best

    ts = [threading.Thread(target=work, args=(i,)) for i in range(cores)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return max(walls)
