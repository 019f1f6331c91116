"""Round-4: can ear-packing (rfft_pair) and the matmul FFT (mmfft) win
back the BRIR assembly's 3.25 ms? Stage probe showed: planes rfft_4096
1.62 ms, irfft_4096 +0.22, segment rfft_1024 +1.06, scramble +0.29 —
all XLA FFT dominated. Variants (full assembly → scrambled spectra,
numerically the same map):

  cur        current chain (jnp.fft everywhere)          [baseline]
  pack_x     ears packed via rfft_pair/irfft_pair, impl=xla
  pack_m     ears packed, impl=matmul (mmfft four-step matmul FFTs)

Interleaved serialized in-jit at the official BRIR shape; parity check
at the end (must be f32-exact class, >100 dB).

Run alone on the chip: python scripts/profile_r4_brir_asm_packed.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tinaural_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

from tinaural.config import RenderConfig
from tinaural.data import load_hrir_set
from tinaural.ops.fftpack import irfft_pair, rfft_pair
from tinaural.ops.filters import (ALIGN_GUARD, DELAY_PAD, delay_ramp,
                                  next_pow2)
from tinaural.ops.interp import interpolate
from tinaural.ops.pallas_kernels import scramble_spectra

B, taps = 512, 2048
N = 1 << 19
nb = N // B
T_pad = taps + DELAY_PAD
P = -(-T_pad // B)
L = next_pow2(T_pad)
F2 = B + 1
K = 4

cfg = RenderConfig(stream_block=B)
table = jax.device_put(load_hrir_set("synthetic", taps=taps))
rng = np.random.default_rng(29)
dirs = jax.device_put(np.stack(
    [np.linspace(0, 350, nb) % 360,
     20 * np.sin(np.linspace(0, 9, nb))], axis=1).astype(np.float32))
h, d, g = jax.vmap(lambda a, e: interpolate(table, a, e, cfg))(
    dirs[:, 0], dirs[:, 1])
h, d, g = jax.device_put(h), jax.device_put(d), jax.device_put(g)


def asm_cur(hh):
    dd = jnp.clip(d - ALIGN_GUARD, -ALIGN_GUARD, DELAY_PAD - 16.0)
    H = jnp.fft.rfft(hh, n=L) * delay_ramp(L, dd) * g[..., None]
    he = jnp.fft.irfft(H, n=L)[..., :T_pad]
    pz = jnp.zeros((nb, 2, P * B), he.dtype)
    pz = pz.at[..., :T_pad].set(he).reshape(nb, 2, P, B)
    Hb = jnp.fft.rfft(pz, n=2 * B, axis=-1).transpose(0, 2, 1, 3)
    return scramble_spectra(Hb, 2 * B)


def asm_pack(hh, impl):
    dd = jnp.clip(d - ALIGN_GUARD, -ALIGN_GUARD, DELAY_PAD - 16.0)
    A, Bb = rfft_pair(hh[:, 0], hh[:, 1], L, impl=impl)  # (nb, FL) ×2
    ramp = delay_ramp(L, dd)                             # (nb, 2, FL)
    A = A * ramp[:, 0] * g[:, 0, None]
    Bb = Bb * ramp[:, 1] * g[:, 1, None]
    a, b = irfft_pair(A, Bb, L, impl=impl)               # (nb, L) ×2
    he = jnp.stack([a[..., :T_pad], b[..., :T_pad]], axis=1)
    pz = jnp.zeros((nb, 2, P * B), he.dtype)
    pz = pz.at[..., :T_pad].set(he).reshape(nb, 2, P, B)
    A2, B2 = rfft_pair(pz[:, 0], pz[:, 1], 2 * B, impl=impl)  # (nb, P, F2)
    Hb = jnp.stack([A2, B2], axis=2)                     # (nb, P, 2, F2)
    return scramble_spectra(Hb, 2 * B)


def mk(f):
    def s(hh):
        r, i = f(hh)
        return jnp.sum(jnp.abs(r)) + jnp.sum(jnp.abs(i))

    @jax.jit
    def one(hh):
        return s(hh)

    @jax.jit
    def rep(hh):
        def body(i, acc):
            return acc + s(hh + i * 1e-9)
        return jax.lax.fori_loop(0, K, body, 0.0)
    return one, rep


VARIANTS = {
    "cur": asm_cur,
    "pack_x": lambda hh: asm_pack(hh, "xla"),
    "pack_m": lambda hh: asm_pack(hh, "matmul"),
}

fns = {}
for name, f in VARIANTS.items():
    try:
        one, rep = mk(f)
        float(np.asarray(one(h)))
        float(np.asarray(rep(h)))
        fns[name] = (one, rep)
        print(f"{name}: compiled ok", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e).splitlines()[0][:150]}", flush=True)

raw = {n: [] for n in fns}
for _ in range(8):
    for n, (one, rep) in fns.items():
        t0 = time.perf_counter(); float(np.asarray(one(h)))
        t1 = time.perf_counter(); float(np.asarray(rep(h)))
        t2 = time.perf_counter()
        raw[n].append(((t2 - t1) - (t1 - t0)) / (K - 1))
for n in fns:
    med = float(np.median(raw[n][1:])) * 1e3
    print(f"{n:8s}: {med:7.3f} ms/call serialized  "
          f"raw={['%.2f' % (v * 1e3) for v in raw[n]]}", flush=True)

# parity (inside jit — no eager complex on axon; scalar d2h only)
@jax.jit
def _parity(hh):
    ra, ia = asm_cur(hh)
    outs = []
    for impl in ("xla", "matmul"):
        rb, ib = asm_pack(hh, impl)
        outs.append(jnp.sum((ra - rb) ** 2 + (ia - ib) ** 2))
    outs.append(jnp.sum(ra ** 2 + ia ** 2))
    return jnp.stack(outs)


ex, em, ref = [float(v) for v in np.asarray(_parity(h))]
for name, err in (("pack_x", ex), ("pack_m", em)):
    print(f"{name} vs cur SNR: {10 * np.log10(ref / max(err, 1e-30)):.1f} dB",
          flush=True)
