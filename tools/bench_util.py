"""Honest TPU step timing through tunneled runtimes.

On remote/tunneled TPU backends ``block_until_ready`` can return before the
device finishes; only a host value fetch truly synchronizes. ``steps_per_sec``
times a self-feeding step function with a forced scalar fetch at the end and
uses a two-point fit to cancel the constant dispatch+fetch overhead.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple


def time_steps(step_once: Callable[[object], Tuple[object, object]],
               state, n1: int = 10, n2: int = 50, repeats: int = 2):
    """step_once(state) -> (state, scalar_like). Returns (sec_per_step, state).

    Runs n1 then n2 chained steps (each block ends with float(scalar) to force
    completion); per-step time = slope between the two. Takes the best of
    ``repeats`` to reject warmup/compile noise.
    """
    def run(n, st):
        t0 = time.perf_counter()
        last = None
        for _ in range(n):
            st, last = step_once(st)
        float(last)
        return time.perf_counter() - t0, st

    # warmup: compile + one synced step
    _, state = run(2, state)

    best = float("inf")
    for _ in range(repeats):
        t1, state = run(n1, state)
        t2, state = run(n2, state)
        dt = (t2 - t1) / (n2 - n1)
        if 0 < dt < best:
            best = dt
    return best, state
