"""Round-4: (chunk 32/64/96) x (dir_rate 1/4) for the 64-src moving
scene at the official bench shape (S=64, nb=128, B=1024, taps=128),
interleaved in one process, serialized in-jit device time.

MEASURED (2026-08-17, the 96 sweep): dir4 — 96 wins: 1.240 ms vs
1.385 (64) vs 1.567 (32); dir1 — 32 stays best: 1.690 vs 1.783 (96)
vs 1.943 (64). Shipped as the 96 → 64 → 32 ladder for fast-path
launches, chunk 32 for dir1 scenes (models.renderer._fused_render).

Motivation: the scene runs at 78.5% of bf16 peak at chunk=32/k=1, and
the round's dir_rate=4 A/B LOST there (139k vs 182k aggregate) because
the unique-assembly matmuls shrink to M = 2*chunk/k = 16 rows. A bigger
chunk restores M (chunk 64 -> 32 rows at k=4, 128 rows at k=1 — full
MXU sublane fill) while the VMEM estimate stays under budget
(block_render_vmem_bytes: 20.5 MiB at chunk 64, S=64; 36 MiB estimated
at chunk 128 ~ 18 MiB empirical, compile-probed here).

Run alone on the chip: python scripts/profile_r4_scene_chunk.py

(Chunk 128 failed the Mosaic compile in the first sweep — the tuple now
probes 96, the largest-compiling point, after the headline chunk-96 win
in profile_r4_chunk96.py.)
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
K = 4  # renders per serialized in-jit repeat


def main():
    table = jax.device_put(load_hrir_set("synthetic"))
    rng = np.random.default_rng(2)
    S, N, B = 64, 1 << 17, 1024
    nb = N // B
    taps, n_fft = 128, 2048
    xbs = jax.device_put(rng.standard_normal((S, nb, B)).astype(np.float32))
    dirs = np.stack([rng.uniform(0, 360, (S, nb)),
                     rng.uniform(-40, 90, (S, nb))], axis=-1).astype(np.float32)
    A = table.h.shape[1]
    ht, dg = gather_tables(table.h, table.delays, table.gains, taps, n_fft)

    def weights(d):  # d: (S, nb, 2) -> idx, w (S, nb, 4)
        flat = jnp.asarray(d.reshape(S * nb, 2))
        eidx, aidx, w = jax.vmap(lambda a, e: direction_weights(
            table.elevs, table.az_counts, a, e, "bilinear"))(flat[:, 0],
                                                             flat[:, 1])
        idx = (eidx * A + aidx).astype(jnp.float32).reshape(S, nb, 4)
        return idx, w.astype(jnp.float32).reshape(S, nb, 4)

    # dir_rate=k kernel path REQUIRES snapped tracks (unique-filter
    # slicing [::k] — RenderConfig.dir_rate semantics).
    snapped = {1: dirs, 4: dirs[:, (np.arange(nb) // 4) * 4]}
    iw = {k: weights(d) for k, d in snapped.items()}

    def make(ch, k):
        idx, w4 = iw[k]

        def call(x):
            return fused_block_render(None, None, None, x, taps, n_fft,
                                      precision="tri", idx=idx, w=w4,
                                      ht=ht, dg=dg, chunk=ch, dir_rate=k)

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
    for ch in (32, 64, 96):
        for k in (1, 4):
            try:
                one, rep = make(ch, k)
                float(np.asarray(one(xbs)))
                float(np.asarray(rep(xbs)))
                fns[(ch, k)] = (one, rep)
                print(f"chunk {ch} dir {k}: compiled ok", flush=True)
            except Exception as e:
                print(f"chunk {ch} dir {k}: FAILED "
                      f"{str(e).splitlines()[0][:140]}", flush=True)

    def est(one, rep):
        t0 = time.perf_counter(); float(np.asarray(one(xbs)))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(np.asarray(rep(xbs)))
        tk = time.perf_counter() - t0
        return (tk - t1) / (K - 1)

    res = {kk: [] for kk in fns}
    for _ in range(6):
        for kk, (o, r) in fns.items():
            res[kk].append(est(o, r))
    for (ch, k), es in res.items():
        m = float(np.median(es))
        print(f"chunk {ch:3d} dir {k}: {m*1e3:7.3f} ms "
              f"({S * N / SR / m:8.0f} agg a-s/s) "
              f"raw={[f'{e*1e3:.2f}' for e in es]}")


if __name__ == "__main__":
    main()
