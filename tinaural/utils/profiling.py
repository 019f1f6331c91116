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
    backend, including the axon tunnel. Complex leaves are split on
    device first: the axon backend cannot d2h complex arrays at all
    (machine quirk), and float() of a complex would raise anyway.
    """
    import jax.numpy as jnp

    leaf = jax.tree.leaves(x)[-1]
    if jnp.iscomplexobj(leaf):
        leaf = jnp.real(leaf)  # on-device split; tiny eager op
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


def marginal_cost(call, k1: int = 2, k2: int = 12, reps: int = 5) -> float:
    """Marginal pipelined seconds per call of ``call()``.

    The tunnel-safe measurement recipe (docs/BENCH_NOTES.md "Measurement
    reality"): time a batch of k1 calls and a batch of k2 calls, each
    closed by one `fence`, and take (t2−t1)/(k2−k1) so the per-fence
    round trip cancels. Medians only the POSITIVE paired estimates —
    tunnel jitter can make individual estimates negative, and a clamped
    near-zero median would report absurd throughput. Falls back to the
    conservative upper bound t(k2)/k2 (includes one fence RTT: never
    inflates performance) when jitter drowns every estimate.

    ``call`` must return a device value (array or pytree); to keep XLA
    from dead-code-eliminating the work, make it an output that depends
    on the whole computation (e.g. the rendered block, or a scalar sum).

    Single-leg case of `marginal_cost_ab` — one estimator, one place to
    calibrate (warmup/settle schedule, positive-median fallback).
    """
    return marginal_cost_ab({"_": call}, k1=k1, k2=k2, reps=reps)["_"]


def marginal_cost_ab(calls: dict, k1: int = 2, k2: int = 12,
                     reps: int = 5) -> dict:
    """INTERLEAVED `marginal_cost` for an A/B (or A/B/C…) comparison:
    each rep times every leg's (k1, k2) pair back to back before the
    next rep starts, so slow in-process drift (allocator/tunnel ramp —
    the documented up-to-4× swing) hits all legs equally. Sequential
    per-leg medians are NOT a trustworthy A/B on this tunnel
    (docs/BENCH_NOTES.md "Measurement reality"); this is. Returns
    {name: marginal seconds} with the same positive-median /
    conservative-fallback estimator as `marginal_cost`."""

    def batch(call, k):
        t0 = time.perf_counter()
        y = None
        for _ in range(k):
            y = call()
        fence(y)
        return time.perf_counter() - t0

    for c in calls.values():  # compile + warm + settle, per leg
        batch(c, 1), batch(c, 1), batch(c, k1), batch(c, k2)
    ests = {n: [] for n in calls}
    t2s = {n: [] for n in calls}
    for _ in range(reps):
        for n, c in calls.items():
            t1 = batch(c, k1)
            t2 = batch(c, k2)
            ests[n].append((t2 - t1) / (k2 - k1))
            t2s[n].append(t2)
    out = {}
    for n in calls:
        pos = [e for e in ests[n] if e > 0]
        out[n] = (float(np.median(pos)) if len(pos) >= 2
                  else float(min(t2s[n])) / k2)
    return out
