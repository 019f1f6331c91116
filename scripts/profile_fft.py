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
    # the axon backend cannot materialise complex arrays eagerly: build
    # them on-device inside jit from real planes
    zr = jax.device_put(rng.standard_normal((NB, NFFT)).astype(np.float32))
    zi = jax.device_put(rng.standard_normal((NB, NFFT)).astype(np.float32))
    y2r = jax.device_put(rng.standard_normal((NB, 2, F)).astype(np.float32))
    y2i = jax.device_put(rng.standard_normal((NB, 2, F)).astype(np.float32))
    zc = jax.jit(jax.lax.complex)(zr, zi)
    y2 = jax.jit(jax.lax.complex)(y2r, y2i)

    from tinaural.ops.fftpack import irfft_pair, rfft_pair

    probes = {
        "rfft (nb,2048)": (jax.jit(lambda x: jnp.fft.rfft(x, n=NFFT).real), (x,)),
        "fft_c (nb,2048)": (jax.jit(lambda z: jnp.fft.fft(z).real), (zc,)),
        "irfft (nb,2,1025)": (jax.jit(lambda y: jnp.fft.irfft(y, n=NFFT)), (y2,)),
        "ifft_c (nb,2048)": (jax.jit(lambda z: jnp.fft.ifft(z).real), (zc,)),
        "2x rfft (Xu+Xd)": (jax.jit(
            lambda x: (jnp.fft.rfft(x * 0.5, n=NFFT).real
                       + jnp.fft.rfft(x * 0.25, n=NFFT).real)), (x,)),
        "rfft_pair packed": (jax.jit(
            lambda x: rfft_pair(x * 0.5, x * 0.25, NFFT)[0].real), (x,)),
        "irfft_pair packed": (jax.jit(
            lambda y: irfft_pair(y[:, 0], y[:, 1], NFFT)[0]), (y2,)),
    }
    for rnd in range(2):
        for name, (fn, args) in probes.items():
            t = marginal(lambda: fn(*args))
            print(f"[round {rnd}] {name:18s} {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
