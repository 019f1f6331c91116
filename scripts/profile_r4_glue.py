"""Round-4 bisect: where do the headline call's NON-kernel ~0.9 ms go?

The chunk A/B showed fused_block_render alone at 0.43-0.47 ms while the
full _trajectory_fn runs 1.40 ms device time. Candidates: per-block
direction_weights, gather_tables, the wrapper pads/reshapes, the output
stack. Times each stage with the in-jit fori_loop pattern.

Run alone on the chip: python scripts/profile_r4_glue.py
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
from tinaural.ops.interp import direction_weights, interpolate
from tinaural.ops.pallas_kernels import fused_block_render, gather_tables

SR = 44100
K = 8


def timed_pair(one, rep, reps=5):
    float(np.asarray(one()))
    float(np.asarray(rep()))
    es = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(np.asarray(one())); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(np.asarray(rep())); tk = time.perf_counter() - t0
        es.append((tk - t1) / (K - 1))
    return float(np.median(es))


def main():
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

    def stage_weights(d):
        eidx, aidx, wts = jax.vmap(lambda a, e: direction_weights(
            table.elevs, table.az_counts, a, e, "bilinear"))(d[:, 0], d[:, 1])
        return (jnp.sum(eidx) + jnp.sum(aidx)).astype(jnp.float32) + jnp.sum(wts)

    def stage_interp(d):  # full XLA gather+lerp path (h, d, g)
        h, dd, g = jax.vmap(lambda a, e: interpolate(table, a, e, cfg))(
            d[:, 0], d[:, 1])
        return jnp.sum(h) + jnp.sum(dd) + jnp.sum(g)

    def stage_tables(d):
        ht, dg = gather_tables(table.h, table.delays, table.gains, taps, n_fft)
        return jnp.sum(ht) + jnp.sum(dg) + jnp.sum(d)

    def stage_full(d, x):
        return jnp.sum(jnp.abs(_trajectory_fn(table, x, d, cfg)))

    def stage_kernel_plus_prep(d, x):  # everything _fused_render does
        eidx, aidx, wts = jax.vmap(lambda a, e: direction_weights(
            table.elevs, table.az_counts, a, e, "bilinear"))(d[:, 0], d[:, 1])
        idx = (eidx * A + aidx).astype(jnp.float32).reshape(1, nb, 4)
        w4 = wts.astype(jnp.float32).reshape(1, nb, 4)
        ht, dg = gather_tables(table.h, table.delays, table.gains, taps, n_fft)
        y = fused_block_render(None, None, None, x[None], taps, n_fft,
                               precision="tri", idx=idx, w=w4, ht=ht, dg=dg)
        return jnp.sum(jnp.abs(y))

    stages = {
        "direction_weights": lambda args: stage_weights(args[0]),
        "xla_interpolate  ": lambda args: stage_interp(args[0]),
        "gather_tables    ": lambda args: stage_tables(args[0]),
        "kernel+prep      ": lambda args: stage_kernel_plus_prep(*args),
        "full _trajectory ": lambda args: stage_full(*args),
    }
    for name, fn in stages.items():
        @jax.jit
        def one(d, x, fn=fn):
            return fn((d, x))

        @jax.jit
        def rep(d, x, fn=fn):
            def body(i, acc):
                return acc + fn((d + i * 1e-9, x))
            return jax.lax.fori_loop(0, K, body, 0.0)

        try:
            med = timed_pair(lambda: one(dirs, xb), lambda: rep(dirs, xb))
            print(f"{name}: {med*1e3:7.3f} ms/iter")
        except Exception as e:
            print(f"{name}: FAILED {str(e).splitlines()[0][:140]}")


if __name__ == "__main__":
    main()
