"""Interleaved A/B: XLA fft/ifft vs the two-stage matmul FFT at the
block-renderer shape (2048 rows × 2048 points). DCE-safe scalar sums.
Run alone: python scripts/profile_mmfft.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tinaural.ops.mmfft import fft_planes

R, N = 2048, 2048


def marginal(call, k1=2, k2=12, reps=3):
    from tinaural.utils.profiling import marginal_cost

    return marginal_cost(call, k1=k1, k2=k2, reps=reps)


def main():
    rng = np.random.default_rng(0)
    xr = jax.device_put(rng.standard_normal((R, N)).astype(np.float32))
    xi = jax.device_put(rng.standard_normal((R, N)).astype(np.float32))

    HI = jax.lax.Precision.HIGHEST
    DF = jax.lax.Precision.DEFAULT
    probes = {
        "xla fft_c": jax.jit(lambda a, b: jnp.sum(
            jnp.abs(jnp.fft.fft(jax.lax.complex(a, b))))),
        "xla ifft_c": jax.jit(lambda a, b: jnp.sum(
            jnp.abs(jnp.fft.ifft(jax.lax.complex(a, b))))),
        "mm fft HIGHEST": jax.jit(lambda a, b: sum(
            jnp.sum(jnp.abs(t)) for t in fft_planes(a, b, N, False, HI))),
        "mm ifft HIGHEST": jax.jit(lambda a, b: sum(
            jnp.sum(jnp.abs(t)) for t in fft_planes(a, b, N, True, HI))),
        "mm fft DEFAULT": jax.jit(lambda a, b: sum(
            jnp.sum(jnp.abs(t)) for t in fft_planes(a, b, N, False, DF))),
    }
    for c in probes.values():
        float(np.asarray(c(xr, xi)))
    res = {k: [] for k in probes}
    for rnd in range(4):
        for k, c in probes.items():
            res[k].append(marginal(lambda: c(xr, xi)))
    for k, ts in res.items():
        med = float(np.median(ts))
        print(f"{k:16s} {med*1e3:8.3f} ms  [{min(ts)*1e3:7.3f},{max(ts)*1e3:8.3f}]",
              flush=True)


if __name__ == "__main__":
    main()
