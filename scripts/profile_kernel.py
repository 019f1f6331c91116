"""Fused-kernel A/B: precision tiers and accuracy vs the XLA chain.

Times fused_assembly_mac alone (marginal, pipelined) at DEFAULT / HIGH /
HIGHEST matmul precision and reports each tier's agreement with the
HIGHEST-precision XLA reference — picks the cheapest tier that keeps the
end-to-end ≥60 dB budget comfortable. Run alone:
  python scripts/profile_kernel.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tinaural import RenderConfig, load_hrir_set
from tinaural.ops.filters import DELAY_PAD, filter_spectrum_mm, next_pow2
from tinaural.ops.interp import interpolate
from tinaural.ops.pallas_kernels import fused_assembly_mac

B = 1024
N = 1 << 21
NB = N // B
CFG = RenderConfig(block_size=B)


def marginal(call, k1=2, k2=12, reps=3):
    from tinaural.utils.profiling import marginal_cost

    return marginal_cost(call, k1=k1, k2=k2, reps=reps)


def main():
    table = load_hrir_set("synthetic")
    tbl = jax.device_put(table)
    taps = np.asarray(table.h).shape[-1]
    n_fft = next_pow2(B + taps + DELAY_PAD - 1)
    rng = np.random.default_rng(0)
    dirs = np.stack([np.linspace(0, 350, NB) % 360,
                     40 * np.sin(np.linspace(0, 20, NB))], axis=1).astype(np.float32)
    h, d, g = jax.jit(jax.vmap(lambda a, e: interpolate(tbl, a, e, CFG)))(
        jnp.asarray(dirs[:, 0]), jnp.asarray(dirs[:, 1]))
    xb = rng.standard_normal((NB, B)).astype(np.float32)
    ramp = (np.arange(B, dtype=np.float32) + 0.5) / B
    Xu = jnp.fft.rfft(jnp.asarray(xb * ramp), n=n_fft)
    Xd = jnp.fft.rfft(jnp.asarray(xb * (1 - ramp)), n=n_fft)
    Xu, Xd = jax.device_put((Xu, Xd))
    first = jnp.zeros(NB, jnp.float32).at[0].set(1.0)

    @jax.jit
    def ref_fn(h, d, g, Xu, Xd):
        Hc = filter_spectrum_mm(h, d, g, taps, n_fft)
        Hp = jnp.concatenate([Hc[:1], Hc[:-1]], axis=0)
        return Xu[:, None, :] * Hc + Xd[:, None, :] * Hp

    @jax.jit
    def ref_scalar(h, d, g, Xu, Xd):
        Y = ref_fn(h, d, g, Xu, Xd)
        return jnp.sum(jnp.real(Y)) + jnp.sum(jnp.imag(Y))

    ref = ref_fn(h, d, g, Xu, Xd)
    rr = np.asarray(jnp.real(ref), np.float64)
    ri = np.asarray(jnp.imag(ref), np.float64)
    e_ref = (rr**2 + ri**2).sum()
    t_ref = marginal(lambda: ref_scalar(h, d, g, Xu, Xd))
    print(f"xla_chain(HIGHEST)   {t_ref*1e3:8.3f} ms", flush=True)

    from tinaural.ops.ola import overlap_add

    @jax.jit
    def epilogue(Y):
        y = jnp.fft.irfft(Y, n=n_fft)
        return overlap_add(jnp.moveaxis(y, 0, 1), B)

    t_epi = marginal(lambda: epilogue(ref)[None])
    print(f"epilogue(irfft+OLA)  {t_epi*1e3:8.3f} ms", flush=True)

    xbj = jax.device_put(xb)
    rampj = jnp.asarray(ramp)

    @jax.jit
    def in_rffts(xb):
        Xu = jnp.fft.rfft(xb * rampj, n=n_fft)
        Xd = jnp.fft.rfft(xb * (1.0 - rampj), n=n_fft)
        return Xu[:, None, :] * 1.0 + Xd[:, None, :] * 0.0

    t_rfft = marginal(lambda: in_rffts(xbj))
    print(f"input rffts(+bcast)  {t_rfft*1e3:8.3f} ms", flush=True)

    for prec in ("DEFAULT", "HIGHEST"):
        p = getattr(jax.lax.Precision, prec)
        call = lambda: fused_assembly_mac(h, d, g, Xu, Xd, first, taps,
                                          n_fft, crossfade=True, precision=p)
        Y = call()
        yr = np.asarray(jnp.real(Y), np.float64)
        yi = np.asarray(jnp.imag(Y), np.float64)
        snr = 10 * np.log10(e_ref / ((rr - yr)**2 + (ri - yi)**2).sum())
        scal = jax.jit(lambda h, d, g, Xu, Xd, pp=p: (lambda Y: jnp.sum(
            jnp.real(Y)) + jnp.sum(jnp.imag(Y)))(fused_assembly_mac(
                h, d, g, Xu, Xd, first, taps, n_fft, crossfade=True,
                precision=pp)))
        t = marginal(lambda: scal(h, d, g, Xu, Xd))
        print(f"kernel {prec:8s}      {t*1e3:8.3f} ms   vs xla {snr:6.1f} dB",
              flush=True)


if __name__ == "__main__":
    main()
