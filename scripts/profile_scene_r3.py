"""On-chip round-3 A/B: scene_chunk sweep under the single-epilogue scene
structure + 1-src headline stage decomposition.

Interleaved within one process (the only trustworthy comparison on the
tunnel — docs/BENCH_NOTES.md "Measurement reality"). Probes return scalar
sums of their full result (slice-returning probes get DCE-poisoned).

Run alone on the chip: python scripts/profile_scene_r3.py
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
from tinaural.models.renderer import (_scene_fn, _scene_static_fn,
                                      _trajectory_fn,
                                      _trajectory_spectra_batched,
                                      _irfft_ears, next_pow2)
from tinaural.ops.filters import DELAY_PAD
from tinaural.ops.ola import overlap_add

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

    # ---------------- 1-src headline stage decomposition ----------------
    N, B = 1 << 21, 1024
    nb = N // B
    cfg = RenderConfig(block_size=B)
    taps = table.h.shape[-1]
    n_fft = next_pow2(B + taps + DELAY_PAD - 1)
    xb = jax.device_put(rng.standard_normal((nb, B)).astype(np.float32))
    dirs = jax.device_put(
        np.stack([np.linspace(0, 350, nb) % 360,
                  40 * np.sin(np.linspace(0, 20, nb))], 1).astype(np.float32))

    @partial(jax.jit, static_argnames=("config",))
    def spectra_only(tbl, xb, dirs, config):
        Y = _trajectory_spectra_batched(tbl, xb[None], dirs[None], config)[0]
        return jnp.sum(jnp.abs(Y))  # scalar: no DCE, no epilogue

    @partial(jax.jit, static_argnames=("config",))
    def full_sum(tbl, xb, dirs, config):
        return jnp.sum(jnp.abs(_trajectory_fn(tbl, xb, dirs, config)))

    # epilogue-only: feed a fixed Y through irfft+OLA
    Yfix_r = jax.device_put(
        rng.standard_normal((nb, 2, n_fft // 2 + 1)).astype(np.float32))
    Yfix_i = jax.device_put(
        rng.standard_normal((nb, 2, n_fft // 2 + 1)).astype(np.float32))

    @partial(jax.jit, static_argnames=("config",))
    def epilogue_only(Yr, Yi, config):
        Y = jax.lax.complex(Yr, Yi)
        return jnp.sum(jnp.abs(overlap_add(_irfft_ears(Y, n_fft, config), B)))

    probes = {
        "full": lambda: full_sum(tbl, xb, dirs, cfg),
        "spectra(kernel)": lambda: spectra_only(tbl, xb, dirs, cfg),
        "epilogue(irfft+OLA)": lambda: epilogue_only(Yfix_r, Yfix_i, cfg),
    }
    for name, call in probes.items():
        call()
        print(f"compiled {name}", flush=True)
    for rnd in range(3):
        for name, call in probes.items():
            t = marginal(call, 2, 10)
            print(f"[round {rnd}] {name:22s}: {t*1e3:7.3f} ms "
                  f"({N/SR/t:8.0f} audio-sec/s)", flush=True)

    # ---------------- scene_chunk sweep (new single-epilogue) ----------
    S, Nm = 64, 1 << 17
    nbm = Nm // B
    xbs = jax.device_put(rng.standard_normal((S, nbm, B)).astype(np.float32))
    dmov = jax.device_put(rng.uniform(0, 360, (S, nbm, 2)).astype(np.float32))
    dstat = jax.device_put(
        np.stack([rng.uniform(0, 360, S), rng.uniform(-40, 90, S)],
                 1).astype(np.float32))
    # static scene at bench scale (2^18/src)
    nbs = (1 << 18) // B
    xbs_s = jax.device_put(
        rng.standard_normal((S, nbs, B)).astype(np.float32))

    chunks = (8, 16, 32, 64)
    mov = {ch: (lambda c=RenderConfig(block_size=B, scene_chunk=ch):
                (lambda: jnp.sum(jnp.abs(_scene_fn(tbl, xbs, dmov, c)))))()
           for ch in chunks}
    stat = {ch: (lambda c=RenderConfig(block_size=B, scene_chunk=ch):
                 (lambda: jnp.sum(jnp.abs(
                     _scene_static_fn(tbl, xbs_s, dstat, c)))))()
            for ch in chunks}
    for ch in chunks:
        mov[ch]()
        print(f"compiled moving chunk={ch}", flush=True)
    for ch in chunks:
        stat[ch]()
        print(f"compiled static chunk={ch}", flush=True)
    for rnd in range(3):
        for ch in chunks:
            t = marginal(mov[ch])
            print(f"[round {rnd}] moving chunk={ch:2d}: {t*1e3:8.2f} ms "
                  f"({S*Nm/SR/t:8.0f} agg audio-sec/s)", flush=True)
        for ch in chunks:
            t = marginal(stat[ch])
            print(f"[round {rnd}] static chunk={ch:2d}: {t*1e3:8.2f} ms "
                  f"({S*(1 << 18)/SR/t:8.0f} agg audio-sec/s)", flush=True)


if __name__ == "__main__":
    main()
