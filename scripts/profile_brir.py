"""On-chip A/B for the BRIR/partitioned path (round-3 VERDICT #4).

Compares the long-filter assembly routes inside `_partitioned_fn`
(filter_path matmul vs fft — at taps=2048 the zoom matmuls are ~39 GFLOP
per call while the fft chain is O(n log n)) and block sizes, interleaved
in one process.

Run alone on the chip: python scripts/profile_brir.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tinaural_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

from tinaural import RenderConfig, load_hrir_set
from tinaural.models.renderer import _partitioned_fn

SR = 44100


def marginal(call, k1=1, k2=5, reps=3):
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
    rng = np.random.default_rng(6)
    N = 1 << 17
    table = load_hrir_set("synthetic", taps=2048)
    tbl = jax.device_put(table)

    probes = {}
    for B in (256, 512):
        nb = N // B
        xb = jax.device_put(
            rng.standard_normal((nb, B)).astype(np.float32))
        dirs = jax.device_put(np.stack(
            [np.linspace(0, 350, nb) % 360,
             20 * np.sin(np.linspace(0, 9, nb))], 1).astype(np.float32))
        for fp in ("matmul", "fft"):
            cfg = RenderConfig(stream_block=B, filter_path=fp)
            probes[f"B={B} {fp:6s}"] = (
                lambda x=xb, d=dirs, c=cfg:
                jnp.sum(jnp.abs(_partitioned_fn(tbl, x, d, c))))

    for name, call in probes.items():
        call()
        print(f"compiled {name}", flush=True)
    res = {n: [] for n in probes}
    for rnd in range(4):
        for name, call in probes.items():
            t = marginal(call)
            res[name].append(t)
            print(f"[round {rnd}] {name}: {t*1e3:7.3f} ms "
                  f"({N/SR/t:7.0f}x RT)", flush=True)
    print("--- medians ---")
    for name, ts in res.items():
        t = float(np.median(ts))
        print(f"{name}: {t*1e3:7.3f} ms ({N/SR/t:7.0f}x RT)")


if __name__ == "__main__":
    main()
