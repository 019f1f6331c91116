"""Stage-isolation microbenchmark for the trajectory render pipeline.

Times three variants on the real chip to attribute per-block cost:
  full      — gather/interp + filter matmuls + signal FFTs + MAC + OLA
  nointerp  — precomputed (h, d, g) per block: removes gather + weights
  nofilter  — precomputed filter spectra Hc: removes the whole assembly

Run alone (no concurrent compiles — the remote compiler and tunnel are
contention-sensitive):  python scripts/profile_stages.py
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
from tinaural.models.renderer import _trajectory_fn
from tinaural.ops.filters import DELAY_PAD, filter_spectrum_mm, next_pow2
from tinaural.ops.interp import interpolate
from tinaural.ops.ola import overlap_add

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
        float(y[0, -1])
        return time.perf_counter() - t0

    batch(1)
    batch(1)
    ests = []
    for _ in range(reps):
        t1, t2 = batch(k1), batch(k2)
        ests.append((t2 - t1) / (k2 - k1))
    return float(np.median(ests))


def spectral_tail(table, xb, Hc, config):
    n_fft = next_pow2(B + table.h.shape[-1] + DELAY_PAD - 1)
    ramp = (jnp.arange(B, dtype=xb.dtype) + 0.5) / B
    Hp = jnp.concatenate([Hc[:1], Hc[:-1]], axis=0)
    Xu = jnp.fft.rfft(xb * ramp, n=n_fft)
    Xd = jnp.fft.rfft(xb * (1.0 - ramp), n=n_fft)
    Y = Xu[:, None, :] * Hc + Xd[:, None, :] * Hp
    y = jnp.fft.irfft(Y, n=n_fft)
    return overlap_add(jnp.moveaxis(y, 0, 1), B)


def main():
    table = load_hrir_set("synthetic")
    r = BinauralRenderer(table, CFG)
    tbl = r.table
    rng = np.random.default_rng(0)
    xb = jax.device_put(rng.standard_normal((NB, B)).astype(np.float32))
    dirs = jax.device_put(
        np.stack([np.linspace(0, 350, NB) % 360,
                  40 * np.sin(np.linspace(0, 20, NB))], axis=1).astype(np.float32))

    taps = tbl.h.shape[-1]
    n_fft = next_pow2(B + taps + DELAY_PAD - 1)

    h, d, g = jax.jit(jax.vmap(
        lambda a, e: interpolate(tbl, a, e, CFG)))(dirs[:, 0], dirs[:, 1])
    h, d, g = jax.device_put((h, d, g))
    Hc = jax.device_put(
        jax.jit(lambda h, d, g: filter_spectrum_mm(h, d, g, taps, n_fft))(h, d, g))

    @jax.jit
    def nointerp(h, d, g, xb):
        return spectral_tail(tbl, xb, filter_spectrum_mm(h, d, g, taps, n_fft), CFG)

    @jax.jit
    def nofilter(Hc, xb):
        return spectral_tail(tbl, xb, Hc, CFG)

    t_full = marginal(lambda: _trajectory_fn(tbl, xb, dirs, CFG))
    t_noint = marginal(lambda: nointerp(h, d, g, xb))
    t_nofil = marginal(lambda: nofilter(Hc, xb))

    us = lambda t: t / NB * 1e6
    print(f"full:      {t_full*1e3:7.2f} ms  {us(t_full):6.3f} us/block  "
          f"{N/44100/t_full:8.0f} audio-sec/s")
    print(f"nointerp:  {t_noint*1e3:7.2f} ms  {us(t_noint):6.3f} us/block")
    print(f"nofilter:  {t_nofil*1e3:7.2f} ms  {us(t_nofil):6.3f} us/block")
    print(f"-> gather/weights: {us(t_full-t_noint):6.3f} us/block")
    print(f"-> filter matmuls: {us(t_noint-t_nofil):6.3f} us/block")
    print(f"-> signal FFT+MAC+OLA: {us(t_nofil):6.3f} us/block")


if __name__ == "__main__":
    main()
