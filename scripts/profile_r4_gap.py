"""Round-4: interleaved A/B of full _trajectory_fn vs its own
kernel+prep subgraph (same process, alternating rounds — the only
trustworthy comparison on this tunnel). If the gap is real, something in
_trajectory_core beyond direction_weights+gather_tables+kernel costs
~0.4 ms; if not, the glue bisect ordering was contamination.

Run alone on the chip: python scripts/profile_r4_gap.py [chunk]
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
from tinaural.models.renderer import _trajectory_fn
from tinaural.ops.interp import direction_weights
from tinaural.ops.pallas_kernels import fused_block_render, gather_tables

SR = 44100
K = 8


def main():
    ch = int(sys.argv[1]) if len(sys.argv) > 1 else None
    table = jax.device_put(load_hrir_set("synthetic"))
    rng = np.random.default_rng(0)
    N, B = 1 << 21, 1024
    nb = N // B
    taps, n_fft = 128, 2048
    cfg = RenderConfig(block_size=B)
    xb = jax.device_put(rng.standard_normal((nb, B)).astype(np.float32))
    dirs = jax.device_put(np.stack(
        [np.linspace(0, 350, nb) % 360,
         40 * np.sin(np.linspace(0, 20, nb))], 1).astype(np.float32))
    A = table.h.shape[1]

    def kprep(d, x):
        eidx, aidx, wts = jax.vmap(lambda a, e: direction_weights(
            table.elevs, table.az_counts, a, e, "bilinear"))(d[:, 0], d[:, 1])
        idx = (eidx * A + aidx).astype(jnp.float32).reshape(1, nb, 4)
        w4 = wts.astype(jnp.float32).reshape(1, nb, 4)
        ht, dg = gather_tables(table.h, table.delays, table.gains, taps, n_fft)
        y = fused_block_render(None, None, None, x[None], taps, n_fft,
                               precision="tri", idx=idx, w=w4, ht=ht, dg=dg,
                               chunk=ch)
        return jnp.sum(jnp.abs(y))

    def full(d, x):
        return jnp.sum(jnp.abs(_trajectory_fn(table, x, d, cfg)))

    def mk(fn):
        @jax.jit
        def one(d, x):
            return fn(d, x)

        @jax.jit
        def rep(d, x):
            def body(i, acc):
                return acc + fn(d + i * 1e-9, x)
            return jax.lax.fori_loop(0, K, body, 0.0)
        return one, rep

    ko, kr = mk(kprep)
    fo, fr = mk(full)
    for f in (ko, kr, fo, fr):
        float(np.asarray(f(dirs, xb)))
        float(np.asarray(f(dirs, xb)))

    def est(one, rep):
        t0 = time.perf_counter(); float(np.asarray(one(dirs, xb))); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(np.asarray(rep(dirs, xb))); tk = time.perf_counter() - t0
        return (tk - t1) / (K - 1)

    ek, ef = [], []
    for _ in range(7):
        ek.append(est(ko, kr))
        ef.append(est(fo, fr))
    mk_, mf = float(np.median(ek)), float(np.median(ef))
    print(f"kernel+prep (chunk={ch}): {mk_*1e3:7.3f} ms  ({N/SR/mk_:8.0f} a-s/s)")
    print(f"full _trajectory_fn    : {mf*1e3:7.3f} ms  ({N/SR/mf:8.0f} a-s/s)")
    print(f"gap: {(mf-mk_)*1e3:.3f} ms")
    print("raw k:", [f"{e*1e3:.2f}" for e in ek])
    print("raw f:", [f"{e*1e3:.2f}" for e in ef])


if __name__ == "__main__":
    main()
