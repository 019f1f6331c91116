"""On-chip A/B: fused Pallas inverse-FFT+OLA epilogue vs the packed-XLA
epilogue (round-3 VERDICT #2 gate: keep the kernel only on an interleaved
median win ≥~1.25x on the headline).

Interleaved within one process (docs/BENCH_NOTES.md "Measurement reality");
probes return scalar sums of the full result (slice probes get DCE'd).

Run alone on the chip: python scripts/profile_epilogue.py
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
                                      _trajectory_fn, _fused_ola_ears,
                                      _ola_ears, next_pow2)
from tinaural.ops.filters import DELAY_PAD

SR = 44100


def marginal(call, k1=2, k2=10, reps=3):
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

    N, B = 1 << 21, 1024
    nb = N // B
    taps = table.h.shape[-1]
    n_fft = next_pow2(B + taps + DELAY_PAD - 1)
    F = n_fft // 2 + 1
    xb = jax.device_put(rng.standard_normal((nb, B)).astype(np.float32))
    dirs = jax.device_put(
        np.stack([np.linspace(0, 350, nb) % 360,
                  40 * np.sin(np.linspace(0, 20, nb))], 1).astype(np.float32))

    cfg_on = RenderConfig(block_size=B)  # fully-fused pipeline (default)
    cfg_off = RenderConfig(block_size=B, fuse_epilogue=False)
    cfg_xla = RenderConfig(block_size=B, use_pallas=False)

    @partial(jax.jit, static_argnames=("config",))
    def full_sum(tbl, xb, dirs, config):
        return jnp.sum(jnp.abs(_trajectory_fn(tbl, xb, dirs, config)))

    # epilogue-only probes on fixed spectra
    Yr = jax.device_put(rng.standard_normal((nb, 2, F)).astype(np.float32))
    Yi = jax.device_put(rng.standard_normal((nb, 2, F)).astype(np.float32))

    @partial(jax.jit, static_argnames=("config",))
    def epi_only(Yr, Yi, config):
        Y = jax.lax.complex(Yr, Yi)
        if config.fuse_epilogue:
            return jnp.sum(jnp.abs(_fused_ola_ears(Y, n_fft, B, config)))
        return jnp.sum(jnp.abs(_ola_ears(Y, n_fft, B, config)))

    probes = {
        "full fused-pipe": lambda: full_sum(tbl, xb, dirs, cfg_on),
        "full kernel+xla": lambda: full_sum(tbl, xb, dirs, cfg_off),
        "full pure-xla  ": lambda: full_sum(tbl, xb, dirs, cfg_xla),
        "epi kernel     ": lambda: epi_only(Yr, Yi, cfg_on),
        "epi xla        ": lambda: epi_only(Yr, Yi, cfg_off),
    }
    for name, call in probes.items():
        call()
        print(f"compiled {name}", flush=True)
    res = {n: [] for n in probes}
    for rnd in range(5):
        for name, call in probes.items():
            t = marginal(call)
            res[name].append(t)
            print(f"[round {rnd}] {name}: {t*1e3:7.3f} ms "
                  f"({N/SR/t:8.0f} audio-sec/s)", flush=True)
    print("--- medians ---")
    for name, ts in res.items():
        t = float(np.median(ts))
        print(f"{name}: {t*1e3:7.3f} ms ({N/SR/t:8.0f} audio-sec/s)")
    fo = float(np.median(res["full fused-pipe"]))
    fx = float(np.median(res["full kernel+xla"]))
    print(f"headline speedup (kernel+xla / fused-pipe): {fx/fo:.3f}x")

    # parity of the compiled kernel on chip
    cfgs = RenderConfig(block_size=B)
    y_on = np.asarray(_trajectory_fn(tbl, xb, dirs, cfgs), np.float64)
    y_off = np.asarray(_trajectory_fn(tbl, xb, dirs, cfg_off), np.float64)
    snr = 10 * np.log10(np.sum(y_off**2) / np.sum((y_off - y_on)**2))
    print(f"on-chip fused-vs-xla epilogue SNR: {snr:.1f} dB")

    # scenes through the fused epilogue
    S, Nm = 64, 1 << 17
    nbm = Nm // B
    xbs = jax.device_put(rng.standard_normal((S, nbm, B)).astype(np.float32))
    dmov = jax.device_put(rng.uniform(0, 360, (S, nbm, 2)).astype(np.float32))
    nbs = (1 << 18) // B
    xbs_s = jax.device_put(rng.standard_normal((S, nbs, B)).astype(np.float32))
    dstat = jax.device_put(np.stack(
        [rng.uniform(0, 360, S), rng.uniform(-40, 90, S)], 1).astype(np.float32))

    sc = {
        "scene moving fused": lambda: jnp.sum(jnp.abs(
            _scene_fn(tbl, xbs, dmov, cfg_on))),
        "scene moving xla  ": lambda: jnp.sum(jnp.abs(
            _scene_fn(tbl, xbs, dmov, cfg_off))),
        "scene static fused": lambda: jnp.sum(jnp.abs(
            _scene_static_fn(tbl, xbs_s, dstat, cfg_on))),
        "scene static xla  ": lambda: jnp.sum(jnp.abs(
            _scene_static_fn(tbl, xbs_s, dstat, cfg_off))),
    }
    for name, call in sc.items():
        call()
        print(f"compiled {name}", flush=True)
    for rnd in range(3):
        for name, call in sc.items():
            t = marginal(call, 1, 5)
            tot = S * (Nm if "moving" in name else (1 << 18)) / SR
            print(f"[round {rnd}] {name}: {t*1e3:8.2f} ms "
                  f"({tot/t:8.0f} agg audio-sec/s)", flush=True)


if __name__ == "__main__":
    main()
