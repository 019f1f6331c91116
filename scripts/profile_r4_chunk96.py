"""Round-4: chunk 64 vs 96 for the S=1 trajectory (chunk 128 fails the
Mosaic compile — does the intermediate point fit and pay?). Interleaved
in one process, serialized in-jit device time at the official 2^23
workload, both dir rates.

Run alone on the chip: python scripts/profile_r4_chunk96.py
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
    rng = np.random.default_rng(0)
    N, B = 1 << 23, 1024
    nb = N // B
    taps, n_fft = 128, 2048
    xbs = jax.device_put(rng.standard_normal((1, nb, B)).astype(np.float32))
    dirs = np.stack([np.linspace(0, 350, nb) % 360,
                     40 * np.sin(np.linspace(0, 20, nb))],
                    1).astype(np.float32)
    flat = jnp.asarray(dirs)
    eidx, aidx, wts = jax.vmap(lambda a, e: direction_weights(
        table.elevs, table.az_counts, a, e, "bilinear"))(flat[:, 0],
                                                         flat[:, 1])
    A = table.h.shape[1]
    idx = (eidx * A + aidx).astype(jnp.float32).reshape(1, nb, 4)
    w4 = wts.astype(jnp.float32).reshape(1, nb, 4)
    ht, dg = gather_tables(table.h, table.delays, table.gains, taps, n_fft)

    def make(ch, k):
        @jax.jit
        def one(xbs):
            y = fused_block_render(None, None, None, xbs, taps, n_fft,
                                   precision="tri", idx=idx, w=w4, ht=ht,
                                   dg=dg, chunk=ch, dir_rate=k)
            return jnp.sum(jnp.abs(y))

        @jax.jit
        def rep(xbs):
            def body(i, acc):
                y = fused_block_render(None, None, None, xbs + i * 1e-9,
                                       taps, n_fft, precision="tri",
                                       idx=idx, w=w4, ht=ht, dg=dg,
                                       chunk=ch, dir_rate=k)
                return acc + jnp.sum(jnp.abs(y))
            return jax.lax.fori_loop(0, K, body, 0.0)
        return one, rep

    fns = {}
    for ch in (64, 96):
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
        print(f"chunk {ch} dir {k}: {m*1e3:7.3f} ms "
              f"({N/SR/m:8.0f} a-s/s) raw={[f'{e*1e3:.2f}' for e in es]}")


if __name__ == "__main__":
    main()
