"""Interleaved breakdown of the default (fused-kernel) trajectory call:
forward packed fft | kernel | epilogue — DCE-safe (scalar-sum fences).
Run alone: python scripts/profile_kernelpath.py
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
from tinaural.models.renderer import (_irfft_ears, _rfft_updown,
                                      _trajectory_fn)
from tinaural.ops.filters import DELAY_PAD, next_pow2
from tinaural.ops.interp import interpolate
from tinaural.ops.ola import overlap_add
from tinaural.ops.pallas_kernels import fused_assembly_mac

B, N = 1024, 1 << 21
NB = N // B
SR = 44100
CFG = RenderConfig(block_size=B)


def marginal(call, k1=2, k2=12, reps=3):
    from tinaural.utils.profiling import marginal_cost

    return marginal_cost(call, k1=k1, k2=k2, reps=reps)


def main():
    table = load_hrir_set("synthetic")
    r = BinauralRenderer(table, CFG)
    tbl = r.table
    taps = tbl.h.shape[-1]
    n_fft = next_pow2(B + taps + DELAY_PAD - 1)
    Fn = n_fft // 2 + 1
    rng = np.random.default_rng(0)
    xb = jax.device_put(rng.standard_normal((NB, B)).astype(np.float32))
    dirs = jax.device_put(
        np.stack([np.linspace(0, 350, NB) % 360,
                  40 * np.sin(np.linspace(0, 20, NB))], axis=1).astype(np.float32))
    h, d, g = jax.jit(jax.vmap(lambda a, e: interpolate(tbl, a, e, CFG)))(
        dirs[:, 0], dirs[:, 1])
    h, d, g = jax.device_put((h, d, g))
    yr = jax.device_put(rng.standard_normal((NB, 2, Fn)).astype(np.float32))
    yi = jax.device_put(rng.standard_normal((NB, 2, Fn)).astype(np.float32))
    first = jnp.zeros(NB, jnp.float32).at[0].set(1.0)

    @jax.jit
    def fwd(xb):
        Xu, Xd = _rfft_updown(xb, B, n_fft, CFG)
        return (jnp.sum(jnp.real(Xu)) + jnp.sum(jnp.imag(Xu))
                + jnp.sum(jnp.real(Xd)) + jnp.sum(jnp.imag(Xd)))

    Xu, Xd = jax.jit(lambda xb: _rfft_updown(xb, B, n_fft, CFG))(xb)
    Xu, Xd = jax.device_put((Xu, Xd))

    @jax.jit
    def kern(h, d, g, Xu, Xd):
        Y = fused_assembly_mac(h, d, g, Xu, Xd, first, taps, n_fft)
        return jnp.sum(jnp.real(Y)) + jnp.sum(jnp.imag(Y))

    @jax.jit
    def epi(yr, yi):
        Y = jax.lax.complex(yr, yi)
        return overlap_add(_irfft_ears(Y, n_fft, CFG), B)

    @jax.jit
    def gath(dirs):
        h, d, g = jax.vmap(lambda a, e: interpolate(tbl, a, e, CFG))(
            dirs[:, 0], dirs[:, 1])
        return jnp.sum(h) + jnp.sum(d) + jnp.sum(g)

    probes = {
        "full(default)": lambda: _trajectory_fn(tbl, xb, dirs, CFG),
        "fwd packed fft": lambda: fwd(xb),
        "kernel(asm+MAC)": lambda: kern(h, d, g, Xu, Xd),
        "epilogue": lambda: epi(yr, yi),
        "gather": lambda: gath(dirs),
    }
    for c in probes.values():
        c()
    res = {k: [] for k in probes}
    for rnd in range(3):
        for k, c in probes.items():
            res[k].append(marginal(c))
    for k, ts in res.items():
        med = float(np.median(ts))
        print(f"{k:16s} {med*1e3:8.3f} ms  [{min(ts)*1e3:7.3f},{max(ts)*1e3:8.3f}]",
              flush=True)


if __name__ == "__main__":
    main()
