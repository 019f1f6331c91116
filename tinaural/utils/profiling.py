"""Tracing / profiling utilities (SURVEY.md §5 "Tracing / profiling").

Wraps `jax.profiler` for Perfetto/XProf traces and provides an execution
fence that is reliable on backends whose `block_until_ready` is
asynchronous (the axon TPU tunnel on this machine dispatches without
awaiting completion — measured: a 2048-block render "finished" in 20 µs).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

import jax


def fence(x) -> float:
    """Force execution of everything producing ``x``; returns one element.

    Device execution is in-order, so fencing the last output of a batch
    of dispatches fences the whole batch. Uses a 1-element device→host
    read — unlike `block_until_ready`, this is synchronous on every
    backend, including the axon tunnel.
    """
    leaf = jax.tree.leaves(x)[-1]
    return float(np.asarray(leaf.ravel()[-1]))


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tinaural-trace"):
    """Capture a profiler trace (view with XProf/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def enable_debug_checks(nans: bool = True, infs: bool = True) -> None:
    """Turn on JAX's numerical sanitizers (SURVEY.md §5 "Race detection /
    sanitizers"): every jitted computation re-runs un-jitted and raises on
    the first NaN/Inf. Debugging aid — large slowdown."""
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_debug_infs", infs)


def timeit(fn, iters: int = 5, warmup: int = 1) -> float:
    """Best-of wall seconds for fn() (fn must fence its own work)."""
    for _ in range(warmup):
        fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def steady_state(fn, k: int = 16) -> float:
    """Per-call seconds with dispatch pipelining: run 1 call, then k calls,
    fence each batch once; the marginal cost removes the fixed fence/RTT
    overhead (large on tunneled backends)."""
    fn(1)  # warm
    t0 = time.perf_counter()
    fn(1)
    w1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    fn(k)
    wk = time.perf_counter() - t0
    return max((wk - w1) / (k - 1), 1e-9)
