"""Round-4 A/B: fused_block_render chunk size (matmul M dimension).

Baseline device profile (round-4 start): headline 1.40 ms/call, MXU at
~19% of bf16 peak — the matmuls run at M = chunk (32) / 2·chunk rows, so
raising chunk fills more of the 128-row MXU tile per pass. Interleaved
same-process medians (the only trustworthy comparison on this tunnel);
serialized in-jit fori_loop gives the true device time.

Run alone on the chip: python scripts/profile_r4_chunk.py [chunks...]
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
from tinaural.ops.interp import direction_weights
from tinaural.ops.pallas_kernels import fused_block_render, gather_tables

SR = 44100
K = 8


def main():
    chunks = [int(a) for a in sys.argv[1:]] or [32, 48, 64]
    table = jax.device_put(load_hrir_set("synthetic"))
    rng = np.random.default_rng(0)
    N, B = 1 << 21, 1024
    nb = N // B
    taps = 128
    n_fft = 2048
    cfg = RenderConfig(block_size=B)
    xbs = jax.device_put(
        rng.standard_normal((1, nb, B)).astype(np.float32))
    dirs = np.stack([np.linspace(0, 350, nb) % 360,
                     40 * np.sin(np.linspace(0, 20, nb))], 1).astype(np.float32)
    flat = jnp.asarray(dirs)
    eidx, aidx, wts = jax.vmap(lambda a, e: direction_weights(
        table.elevs, table.az_counts, a, e, "bilinear"))(flat[:, 0], flat[:, 1])
    A = table.h.shape[1]
    idx = (eidx * A + aidx).astype(jnp.float32).reshape(1, nb, 4)
    w4 = wts.astype(jnp.float32).reshape(1, nb, 4)
    ht, dg = gather_tables(table.h, table.delays, table.gains, taps, n_fft)

    def make(ch):
        @jax.jit
        def rep(xbs):
            def body(i, acc):
                y = fused_block_render(
                    None, None, None, xbs + i * 1e-9, taps, n_fft,
                    precision="tri", idx=idx, w=w4, ht=ht, dg=dg,
                    chunk=ch)
                return acc + jnp.sum(jnp.abs(y))
            return jax.lax.fori_loop(0, K, body, 0.0)

        @jax.jit
        def one(xbs):
            y = fused_block_render(None, None, None, xbs, taps, n_fft,
                                   precision="tri", idx=idx, w=w4,
                                   ht=ht, dg=dg, chunk=ch)
            return jnp.sum(jnp.abs(y))
        return one, rep

    fns = {}
    for ch in chunks:
        try:
            one, rep = make(ch)
            float(np.asarray(one(xbs)))  # compile probe
            float(np.asarray(rep(xbs)))
            fns[ch] = (one, rep)
            print(f"chunk {ch}: compiled ok")
        except Exception as e:
            print(f"chunk {ch}: COMPILE FAILED: {str(e).splitlines()[0][:160]}")

    def t(call, reps=5):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(call(xbs)))
            ts.append(time.perf_counter() - t0)
        return ts

    # interleaved rounds
    res = {ch: [] for ch in fns}
    for _ in range(5):
        for ch, (one, rep) in fns.items():
            t1 = min(t(one, 2))
            tk = min(t(rep, 2))
            res[ch].append((tk - t1) / (K - 1))
    for ch, es in res.items():
        med = float(np.median(es))
        print(f"chunk {ch}: device {med*1e3:7.3f} ms/call "
              f"({N/SR/med:8.0f} audio-sec/s) raw={[f'{e*1e3:.2f}' for e in es]}")


if __name__ == "__main__":
    main()
