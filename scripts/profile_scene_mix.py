"""On-chip decomposition of the fused scene mixdown kernel: where do the
3.3 ms of a 64-src moving scene go?

Probes (interleaved, one process): full scene vs mix-kernel-only spectra,
the same kernel at DEFAULT matmul precision (times only — tells whether
the 6-pass HIGHEST matmuls dominate), and crossfade=False (halves the
MAC + drops the Hermitian-mirror forward path).

Run alone on the chip: python scripts/profile_scene_mix.py
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
from tinaural.models.renderer import (_scene_fn, _scene_spectra_fused,
                                      _trajectory_fn, next_pow2)
from tinaural.ops.filters import DELAY_PAD
from tinaural.ops.interp import interpolate

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
    table = load_hrir_set("synthetic")
    tbl = jax.device_put(table)
    rng = np.random.default_rng(0)
    S, Nm, B = 64, 1 << 17, 1024
    nb = Nm // B
    taps = table.h.shape[-1]
    n_fft = next_pow2(B + taps + DELAY_PAD - 1)
    cfg = RenderConfig(block_size=B)
    xbs = jax.device_put(rng.standard_normal((S, nb, B)).astype(np.float32))
    dmov = jax.device_put(rng.uniform(0, 360, (S, nb, 2)).astype(np.float32))

    from tinaural.ops.pallas_kernels import fused_block_step_mix

    @partial(jax.jit, static_argnames=("config",))
    def scene_full(tbl, xbs, dirs, config):
        return jnp.sum(jnp.abs(_scene_fn(tbl, xbs, dirs, config)))

    @partial(jax.jit, static_argnames=("config",))
    def spectra_only(tbl, xbs, dirs, config):
        Ysr, Ysi = _scene_spectra_fused(tbl, xbs, dirs, config, n_fft)
        return jnp.sum(jnp.abs(Ysr)) + jnp.sum(jnp.abs(Ysi))

    @partial(jax.jit, static_argnames=("precision", "crossfade"))
    def kernel_only(tbl, xbs, dirs, precision, crossfade=True):
        flat = dirs.reshape(S * nb, 2)
        h, d, g = jax.vmap(lambda a, e: interpolate(tbl, a, e, cfg))(
            flat[:, 0], flat[:, 1])
        Ysr, Ysi = fused_block_step_mix(
            h.reshape(S, nb, 2, taps), d.reshape(S, nb, 2),
            g.reshape(S, nb, 2), xbs, taps, n_fft, crossfade=crossfade,
            precision=precision)
        return jnp.sum(jnp.abs(Ysr)) + jnp.sum(jnp.abs(Ysi))

    @partial(jax.jit, static_argnames=())
    def gather_only(tbl, dirs):
        flat = dirs.reshape(S * nb, 2)
        h, d, g = jax.vmap(lambda a, e: interpolate(tbl, a, e, cfg))(
            flat[:, 0], flat[:, 1])
        return jnp.sum(h) + jnp.sum(d) + jnp.sum(g)

    from tinaural.models.renderer import _fused_ola_from_planes

    Fs = (n_fft // 256 + 1) * 128
    Yfr = jax.device_put(rng.standard_normal((nb, 2, Fs)).astype(np.float32))
    Yfi = jax.device_put(rng.standard_normal((nb, 2, Fs)).astype(np.float32))

    @partial(jax.jit, static_argnames=("config",))
    def epi_only(Yr, Yi, config):
        return jnp.sum(jnp.abs(_fused_ola_from_planes(Yr, Yi, n_fft, B,
                                                      config)))

    HI = jax.lax.Precision.HIGHEST
    DEF = jax.lax.Precision.DEFAULT
    probes = {
        "scene full (fused)  ": lambda: scene_full(tbl, xbs, dmov, cfg),
        "spectra+gather      ": lambda: spectra_only(tbl, xbs, dmov, cfg),
        "kernel HIGHEST      ": lambda: kernel_only(tbl, xbs, dmov, HI),
        "kernel DEFAULT      ": lambda: kernel_only(tbl, xbs, dmov, DEF),
        "kernel no-crossfade ": lambda: kernel_only(tbl, xbs, dmov, HI,
                                                    crossfade=False),
        "gather only         ": lambda: gather_only(tbl, dmov),
        "epilogue only nb128 ": lambda: epi_only(Yfr, Yfi, cfg),
    }
    for name, call in probes.items():
        call()
        print(f"compiled {name}", flush=True)
    res = {n: [] for n in probes}
    for rnd in range(4):
        for name, call in probes.items():
            t = marginal(call)
            res[name].append(t)
            print(f"[round {rnd}] {name}: {t*1e3:8.3f} ms", flush=True)
    print("--- medians ---")
    for name, ts in res.items():
        print(f"{name}: {float(np.median(ts))*1e3:8.3f} ms")

    # DEFAULT-precision parity (is bf16 anywhere near the 60 dB gate?)
    a = np.asarray(kernel_only(tbl, xbs, dmov, HI), np.float64)
    b = np.asarray(kernel_only(tbl, xbs, dmov, DEF), np.float64)
    print(f"|sum| rel diff DEFAULT vs HIGHEST: {abs(a-b)/abs(a):.3e}")


if __name__ == "__main__":
    main()
