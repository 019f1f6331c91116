"""XLA TPU FFT cost probes: is complex fft ≈ rfft (→ two-for-one packing
halves FFT work), and what does the epilogue really cost vs assembly?

Probes run in ONE process, interleaved twice, because cross-process
numbers on the axon tunnel swing far more than the documented ±25%.
Run alone: python scripts/profile_fft.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

B, N = 1024, 1 << 21
NB = N // B
NFFT = 2048
F = NFFT // 2 + 1


def marginal(call, k1=2, k2=12, reps=3):
    def batch(k):
        t0 = time.perf_counter()
        y = None
        for _ in range(k):
            y = call()
        np.asarray(jax.tree.leaves(y)[0])[(0,) * jax.tree.leaves(y)[0].ndim]
        return time.perf_counter() - t0

    batch(1)
    batch(1)
    ests = []
    for _ in range(reps):
        t1, t2 = batch(k1), batch(k2)
        ests.append((t2 - t1) / (k2 - k1))
    return float(np.median(ests))


def main():
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal((NB, B)).astype(np.float32))
    zc = jax.device_put(
        (rng.standard_normal((NB, NFFT)) +
         1j * rng.standard_normal((NB, NFFT))).astype(np.complex64))
    y2 = jax.device_put(
        (rng.standard_normal((NB, 2, F)) +
         1j * rng.standard_normal((NB, 2, F))).astype(np.complex64))

    probes = {
        "rfft (nb,2048)": jax.jit(lambda: jnp.fft.rfft(x, n=NFFT).real),
        "fft_c (nb,2048)": jax.jit(lambda: jnp.fft.fft(zc).real),
        "irfft (nb,2,1025)": jax.jit(lambda: jnp.fft.irfft(y2, n=NFFT)),
        "ifft_c (nb,2048)": jax.jit(lambda: jnp.fft.ifft(zc).real),
        "2x rfft (Xu+Xd)": jax.jit(
            lambda: (jnp.fft.rfft(x * 0.5, n=NFFT).real
                     + jnp.fft.rfft(x * 0.25, n=NFFT).real)),
    }
    for rnd in range(2):
        for name, fn in probes.items():
            t = marginal(fn)
            print(f"[round {rnd}] {name:18s} {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
