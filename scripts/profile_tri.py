"""On-chip A/B: kernel_precision highest vs tri on the headline and the
64-src moving scene (+ parity of tri on chip).

Run alone on the chip: python scripts/profile_tri.py
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


def marginal(call, k1=2, k2=10, reps=4):
    def batch(k):
        t0 = time.perf_counter()
        y = None
        for _ in range(k):
            y = call()
        float(np.asarray(jnp.ravel(y)[-1]))
        return time.perf_counter() - t0

    batch(1)
    batch(1)
    ests = [(batch(k2) - batch(k1)) / (k2 - k1) for _ in range(reps)]
    pos = [e for e in ests if e > 0]
    return float(np.median(pos)) if pos else float(np.median(ests))


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

    cfgs = {p: RenderConfig(block_size=B, kernel_precision=p)
            for p in ("highest", "tri")}

    @partial(jax.jit, static_argnames=("config",))
    def traj(tbl, xb, dirs, config):
        return jnp.sum(jnp.abs(_trajectory_fn(tbl, xb, dirs, config)))

    @partial(jax.jit, static_argnames=("config",))
    def scene(tbl, xbs, dirs, config):
        return jnp.sum(jnp.abs(_scene_fn(tbl, xbs, dirs, config)))

    probes = {}
    for p, c in cfgs.items():
        probes[f"traj  {p:7s}"] = lambda c=c: traj(tbl, xb, dirs, c)
        probes[f"scene {p:7s}"] = lambda c=c: scene(tbl, xbs, dmov, c)
    for name, call in probes.items():
        call()
        print(f"compiled {name}", flush=True)
    res = {n: [] for n in probes}
    for rnd in range(5):
        for name, call in probes.items():
            t = marginal(call, 1, 5)
            res[name].append(t)
            audio = N / SR if name.startswith("traj") else S * Nm / SR
            print(f"[round {rnd}] {name}: {t*1e3:7.3f} ms "
                  f"({audio/t:8.0f} audio-sec/s)", flush=True)
    print("--- medians ---")
    for name, ts in res.items():
        t = float(np.median(ts))
        audio = N / SR if name.startswith("traj") else S * Nm / SR
        print(f"{name}: {t*1e3:7.3f} ms ({audio/t:8.0f} audio-sec/s)")

    # tri parity on chip
    yh = np.asarray(_trajectory_fn(tbl, xb, dirs, cfgs["highest"]), np.float64)
    yt = np.asarray(_trajectory_fn(tbl, xb, dirs, cfgs["tri"]), np.float64)
    snr = 10 * np.log10(np.sum(yh**2) / np.sum((yh - yt)**2))
    print(f"tri-vs-highest on-chip SNR: {snr:.1f} dB")


if __name__ == "__main__":
    main()
