"""Round-4: fused_stream_step per-grid-step chunk (SC) 64 vs 96 vs 128
at the serving-capacity shapes (S = 256 / 1024 listeners, block 256,
taps 128). The render-kernel sweep found 96 > 64 everywhere; does the
streaming kernel (different structure: P-partition FDL MAC, no big
n_fft) agree? Interleaved in one process, serialized in-jit device time
over state-chained pushes (the real serving dependency structure).

Run alone on the chip: python scripts/profile_r4_stream_chunk.py
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
from tinaural.ops.interp import interpolate
from tinaural.config import RenderConfig
from tinaural.ops.pallas_kernels import fused_stream_step

SR = 44100
K = 8  # chained pushes per serialized repeat


def run_for(S: int, chunks=(64, 96, 128)):
    table = jax.device_put(load_hrir_set("synthetic"))
    cfg = RenderConfig(stream_block=256)
    taps, B = table.h.shape[-1], cfg.stream_block
    from tinaural.ops.filters import DELAY_PAD
    P = -(-(taps + DELAY_PAD) // B)
    F2 = B + 1
    rng = np.random.default_rng(11)
    xb = jax.device_put(rng.standard_normal((S, B)).astype(np.float32))
    azs = jnp.asarray(np.linspace(0, 350, S).astype(np.float32))
    els = jnp.zeros((S,), jnp.float32)
    h, d, g = jax.vmap(lambda a, e: interpolate(table, a, e, cfg))(azs, els)

    zeros = lambda *s: jnp.zeros(s, jnp.float32)
    state0 = (zeros(S, B), zeros(S, P, F2), zeros(S, P, F2),
              zeros(S, P, 2, F2), zeros(S, P, 2, F2), zeros(S))

    def make(sc):
        def step(st, x):
            pv, fr, fi, pr, pi, sd = st
            y, fr, fi, pr, pi = fused_stream_step(
                h, d, g, x, pv, fr, fi, pr, pi, sd, taps, B,
                precision="tri", chunk=sc)
            return (x, fr, fi, pr, pi, jnp.ones((S,), jnp.float32)), y

        @jax.jit
        def one(x):
            st, y = step(state0, x)
            return jnp.sum(jnp.abs(y))

        @jax.jit
        def rep(x):
            def body(i, carry):
                st, acc = carry
                st, y = step(st, x + i * 1e-9)
                return (st, acc + jnp.sum(jnp.abs(y)))
            _, acc = jax.lax.fori_loop(0, K, body, (state0, 0.0))
            return acc
        return one, rep

    fns = {}
    for sc in chunks:
        try:
            one, rep = make(sc)
            float(np.asarray(one(xb)))
            float(np.asarray(rep(xb)))
            fns[sc] = (one, rep)
            print(f"S={S} chunk {sc}: compiled ok", flush=True)
        except Exception as e:
            print(f"S={S} chunk {sc}: FAILED {str(e).splitlines()[0][:140]}",
                  flush=True)

    def est(one, rep):
        t0 = time.perf_counter(); float(np.asarray(one(xb)))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(np.asarray(rep(xb)))
        tk = time.perf_counter() - t0
        return (tk - t1) / (K - 1)

    res = {sc: [] for sc in fns}
    for _ in range(6):
        for sc, (o, r) in fns.items():
            res[sc].append(est(o, r))
    for sc, es in res.items():
        m = float(np.median(es))
        agg = S * (B / SR) / m
        print(f"S={S} chunk {sc:3d}: {m*1e3:7.3f} ms/push "
              f"({agg:7.1f} realtime listeners) "
              f"raw={[f'{e*1e3:.2f}' for e in es]}")


def main():
    for S in (1024, 256):
        run_for(S)


if __name__ == "__main__":
    main()
