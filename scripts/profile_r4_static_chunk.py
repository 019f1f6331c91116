"""Round-4: static 64-src scene — kernel launch chunks at the always-
exact k_dir=4 unique-assembly (constant per-source filters), S=64,
B=1024, taps=128, crossfade=False, interleaved in one process,
serialized in-jit device time.

MEASURED (2026-08-17): at the official N=2^17 (≈0.8 ms/call — UNDER the
tunnel dispatch floor) the probe returned negative raw marginals and a
spurious chunk-64 "win"; at N=2^18 (nb=256, above the floor) chunk 96
wins cleanly: 1.472 ms vs 1.796 (tight raws, +22%) — agreeing with the
moving-scene and trajectory sweeps. The renderer's chunk ladder
(96 → 64 → 32, models.renderer._fused_render) therefore applies
uniformly; earlier sweep history: 64 beat 32 here 0.826 vs 1.609 ms.

Run alone on the chip: python scripts/profile_r4_static_chunk.py
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

from tinaural import load_hrir_set
from tinaural.ops.interp import direction_weights
from tinaural.ops.pallas_kernels import fused_block_render, gather_tables

SR = 44100
K = 4


def main():
    table = jax.device_put(load_hrir_set("synthetic"))
    rng = np.random.default_rng(3)
    S, N, B = 64, 1 << 18, 1024
    nb = N // B
    taps, n_fft = 128, 2048
    xbs = jax.device_put(rng.standard_normal((S, nb, B)).astype(np.float32))
    d0 = np.stack([rng.uniform(0, 360, S),
                   rng.uniform(-40, 90, S)], axis=-1).astype(np.float32)
    dirs = np.broadcast_to(d0[:, None], (S, nb, 2))
    A = table.h.shape[1]
    flat = jnp.asarray(np.ascontiguousarray(dirs).reshape(S * nb, 2))
    eidx, aidx, w = jax.vmap(lambda a, e: direction_weights(
        table.elevs, table.az_counts, a, e, "bilinear"))(flat[:, 0],
                                                         flat[:, 1])
    idx = (eidx * A + aidx).astype(jnp.float32).reshape(S, nb, 4)
    w4 = w.astype(jnp.float32).reshape(S, nb, 4)
    ht, dg = gather_tables(table.h, table.delays, table.gains, taps, n_fft)

    def make(ch):
        def call(x):
            return fused_block_render(None, None, None, x, taps, n_fft,
                                      crossfade=False, precision="tri",
                                      idx=idx, w=w4, ht=ht, dg=dg,
                                      chunk=ch, dir_rate=4)

        @jax.jit
        def one(x):
            return jnp.sum(jnp.abs(call(x)))

        @jax.jit
        def rep(x):
            def body(i, acc):
                return acc + jnp.sum(jnp.abs(call(x + i * 1e-9)))
            return jax.lax.fori_loop(0, K, body, 0.0)
        return one, rep

    fns = {}
    for ch in (64, 96):
        try:
            one, rep = make(ch)
            float(np.asarray(one(xbs)))
            float(np.asarray(rep(xbs)))
            fns[ch] = (one, rep)
            print(f"chunk {ch}: compiled ok", flush=True)
        except Exception as e:
            print(f"chunk {ch}: FAILED {str(e).splitlines()[0][:140]}",
                  flush=True)

    def est(one, rep):
        t0 = time.perf_counter(); float(np.asarray(one(xbs)))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(np.asarray(rep(xbs)))
        tk = time.perf_counter() - t0
        return (tk - t1) / (K - 1)

    res = {ch: [] for ch in fns}
    for _ in range(6):
        for ch, (o, r) in fns.items():
            res[ch].append(est(o, r))
    for ch, es in res.items():
        m = float(np.median(es))
        print(f"chunk {ch:3d}: {m*1e3:7.3f} ms "
              f"({S * N / SR / m:8.0f} agg a-s/s) "
              f"raw={[f'{e*1e3:.2f}' for e in es]}")


if __name__ == "__main__":
    main()
