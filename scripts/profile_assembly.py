"""Assembly-chain microbenchmark: attribute the filter-assembly cost.

Round-1 profiling (scripts/profile_stages.py) showed the zoom-matmul
filter assembly ≈ 0.9 µs/block dominates the 1-src moving headline while
running at ~2 TFLOP/s — far below what these matmul shapes should hit.
This script breaks the chain apart on the real chip:

  planes   — ramped_spectrum_planes (M1 matmul + ramp trig + diag)
  trig     — the delay_ramp transcendentals alone
  full     — the whole filter_spectrum_mm
  ma_hi/df — the (nb·2, T_pad)@(T_pad, 2Fn) matmul at HIGHEST vs default
             precision (precision cost of the dominant-FLOPs stage)

Run alone: python scripts/profile_assembly.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tinaural import RenderConfig, load_hrir_set
from tinaural.models import BinauralRenderer
from tinaural.ops.filters import (DELAY_PAD, _rfft_matrix, delay_ramp,
                                  filter_spectrum_mm, next_pow2,
                                  ramped_spectrum_planes)
from tinaural.ops.interp import interpolate

B = 1024
N = 1 << 21
NB = N // B
CFG = RenderConfig(block_size=B)


def marginal(call, k1=2, k2=12, reps=3):
    def batch(k):
        t0 = time.perf_counter()
        y = None
        for _ in range(k):
            y = call()
        float(np.asarray(y)[0])
        return time.perf_counter() - t0

    batch(1)
    batch(1)
    ests = []
    for _ in range(reps):
        t1, t2 = batch(k1), batch(k2)
        ests.append((t2 - t1) / (k2 - k1))
    return float(np.median(ests))


def main():
    table = load_hrir_set("synthetic")
    r = BinauralRenderer(table, CFG)
    tbl = r.table
    rng = np.random.default_rng(0)
    dirs = jax.device_put(
        np.stack([np.linspace(0, 350, NB) % 360,
                  40 * np.sin(np.linspace(0, 20, NB))], axis=1).astype(np.float32))

    taps = tbl.h.shape[-1]
    n_fft = next_pow2(B + taps + DELAY_PAD - 1)
    T_pad = taps + DELAY_PAD
    L = next_pow2(T_pad)

    h, d, g = jax.jit(jax.vmap(
        lambda a, e: interpolate(tbl, a, e, CFG)))(dirs[:, 0], dirs[:, 1])
    h, d, g = jax.device_put((h, d, g))
    h_eff = jax.device_put(rng.standard_normal((NB, 2, T_pad)).astype(np.float32))
    MA = jnp.asarray(_rfft_matrix(taps, n_fft))

    probes = {}

    @jax.jit
    def p_full(h, d, g):
        H = filter_spectrum_mm(h, d, g, taps, n_fft)
        return jnp.real(H[0, 0, :8])

    probes["full_assembly"] = lambda: p_full(h, d, g)

    @jax.jit
    def p_planes(h, d, g):
        return ramped_spectrum_planes(h, d, g, taps)[0, 0, :8]

    probes["planes(M1+trig+diag)"] = lambda: p_planes(h, d, g)

    @jax.jit
    def p_trig(d):
        ramp = delay_ramp(L, d)
        return jnp.real(ramp[0, 0, :8])

    probes["trig(delay_ramp)"] = lambda: p_trig(d)

    @jax.jit
    def p_ma_hi(h_eff):
        H = jnp.matmul(h_eff, MA, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        return H[0, 0, :8]

    probes["MA@HIGHEST"] = lambda: p_ma_hi(h_eff)

    @jax.jit
    def p_ma_df(h_eff):
        H = jnp.matmul(h_eff, MA, preferred_element_type=jnp.float32)
        return H[0, 0, :8]

    probes["MA@default"] = lambda: p_ma_df(h_eff)

    flops = {
        "full_assembly": 2 * NB * 2 * (taps * 2 * (L // 2 + 1)
                                       + 2 * (L // 2 + 1) * T_pad
                                       + T_pad * 2 * (n_fft // 2 + 1)),
        "MA@HIGHEST": 2 * NB * 2 * T_pad * 2 * (n_fft // 2 + 1),
        "MA@default": 2 * NB * 2 * T_pad * 2 * (n_fft // 2 + 1),
    }
    for name, call in probes.items():
        t = marginal(call)
        extra = ""
        if name in flops:
            extra = f"  {flops[name] / t / 1e12:6.2f} TFLOP/s"
        print(f"{name:22s} {t * 1e3:8.3f} ms  {t / NB * 1e6:6.3f} us/block{extra}",
              flush=True)


if __name__ == "__main__":
    main()
