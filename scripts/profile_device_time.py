"""Dispatch-floor-free device timings: run each workload K times INSIDE
one jitted fori_loop (summing outputs so nothing is DCE'd), so a single
host dispatch amortizes over K executions. The per-iteration time is the
true device cost — the number a host-attached deployment would see —
separated from this tunnel's per-call floor (~0.6 ms, measured round 3).

Run alone on the chip: python scripts/profile_device_time.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tinaural_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

from tinaural import RenderConfig, load_hrir_set
from tinaural.models.renderer import _scene_fn, _trajectory_fn

SR = 44100
K = 8  # in-jit repetitions


def timed(call, reps=5):
    call()  # compile + settle
    call()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(call()))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    table = load_hrir_set("synthetic")
    tbl = jax.device_put(table)
    rng = np.random.default_rng(0)
    N, B = 1 << 21, 1024
    nb = N // B
    xb = jax.device_put(rng.standard_normal((nb, B)).astype(np.float32))
    dirs = jax.device_put(
        np.stack([np.linspace(0, 350, nb) % 360,
                  40 * np.sin(np.linspace(0, 20, nb))], 1).astype(np.float32))
    S, Nm = 64, 1 << 17
    nbm = Nm // B
    xbs = jax.device_put(rng.standard_normal((S, nbm, B)).astype(np.float32))
    dmov = jax.device_put(rng.uniform(0, 360, (S, nbm, 2)).astype(np.float32))

    cfg = RenderConfig(block_size=B)

    @partial(jax.jit, static_argnames=("config",))
    def traj_rep(tbl, xb, dirs, config):
        def body(i, acc):
            # vary the input per iteration so XLA can't hoist the render
            return acc + jnp.sum(jnp.abs(_trajectory_fn(
                tbl, xb + i * 1e-9, dirs, config)))
        return jax.lax.fori_loop(0, K, body, 0.0)

    @partial(jax.jit, static_argnames=("config",))
    def scene_rep(tbl, xbs, dirs, config):
        def body(i, acc):
            return acc + jnp.sum(jnp.abs(_scene_fn(
                tbl, xbs + i * 1e-9, dirs, config)))
        return jax.lax.fori_loop(0, K, body, 0.0)

    @partial(jax.jit, static_argnames=("config",))
    def traj_one(tbl, xb, dirs, config):
        return jnp.sum(jnp.abs(_trajectory_fn(tbl, xb, dirs, config)))

    @partial(jax.jit, static_argnames=("config",))
    def scene_one(tbl, xbs, dirs, config):
        return jnp.sum(jnp.abs(_scene_fn(tbl, xbs, dirs, config)))

    t1 = timed(lambda: traj_one(tbl, xb, dirs, cfg))
    tk = timed(lambda: traj_rep(tbl, xb, dirs, cfg))
    s1 = timed(lambda: scene_one(tbl, xbs, dmov, cfg))
    sk = timed(lambda: scene_rep(tbl, xbs, dmov, cfg))
    tdev = (tk - t1) / (K - 1)
    sdev = (sk - s1) / (K - 1)
    print(f"traj : 1-shot {t1*1e3:7.3f} ms | device/iter {tdev*1e3:7.3f} ms"
          f" ({N/SR/tdev:8.0f} audio-sec/s device-limited)")
    print(f"scene: 1-shot {s1*1e3:7.3f} ms | device/iter {sdev*1e3:7.3f} ms"
          f" ({S*Nm/SR/sdev:8.0f} agg audio-sec/s device-limited)")
    print(f"implied per-call overhead: traj {max(t1-tdev,0)*1e3:.3f} ms, "
          f"scene {max(s1-sdev,0)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
