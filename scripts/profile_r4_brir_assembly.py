"""Round-4: where does the BRIR call's time go, and can tri matmuls win
the assembly back?

The chunk probe + the bench roofline agree the fused partitioned kernel
is ~1% of v5e peak and a small fraction of the full `_partitioned_fn`
call — the XLA-side filter assembly (per-block effective_filter rfft_4096
chain + P segment rffts + scramble) dominates. Variants, interleaved
serialized in-jit at the official w_brir shape (nb=1024, B=512,
taps=2048, P=5):

  asm_fft   vmap filter_partitions (fft chain, the current route)
  asm_mmH   vmap filter_partitions_mm (zoom matmuls, HIGHEST = 6 passes)
  asm_mmT   same zoom matmuls via _dot3 (tri = 3 bf16 passes)
  full      _partitioned_fn (current production route)
  kern      fused_partitioned_step alone (random spectra)

Run alone on the chip: python scripts/profile_r4_brir_assembly.py
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
from tinaural.models.renderer import _partitioned_fn
from tinaural.ops.filters import (DELAY_PAD, _partition_zoom_matrices,
                                  filter_partitions, filter_partitions_mm,
                                  ramped_spectrum_planes)
from tinaural.ops.interp import interpolate
from tinaural.ops.pallas_kernels import (_dot3, fused_partitioned_step,
                                         scramble_spectra)

B, taps = 512, 2048
N = 1 << 19
nb = N // B
P = -(-(taps + DELAY_PAD) // B)
K = 4

cfg = RenderConfig(stream_block=B)
table = jax.device_put(load_hrir_set("synthetic", taps=taps))
rng = np.random.default_rng(17)
xb = jax.device_put(rng.standard_normal((nb, B)).astype(np.float32))
dirs = jax.device_put(np.stack(
    [np.linspace(0, 350, nb) % 360,
     20 * np.sin(np.linspace(0, 9, nb))], axis=1).astype(np.float32))
h, d, g = jax.vmap(lambda a, e: interpolate(table, a, e, cfg))(
    dirs[:, 0], dirs[:, 1])
h, d, g = jax.device_put(h), jax.device_put(d), jax.device_put(g)

F2 = B + 1
_, m2, _ = _partition_zoom_matrices(taps, B)
M2 = jax.device_put(jnp.asarray(m2))


def mm_tri(hh, dd, gg):
    G2 = ramped_spectrum_planes(hh, dd, gg, taps)      # (2, 2FL)
    Hm = _dot3(G2, M2).reshape(2, P, 2 * F2)
    return jax.lax.complex(
        Hm[..., :F2], Hm[..., F2:]).transpose(1, 0, 2)


def s_of(H):
    return jnp.sum(jnp.abs(H.real)) + jnp.sum(jnp.abs(H.imag))


def asm_fft(hh):
    Hb = jax.vmap(lambda a, b, c: filter_partitions(
        a, b, c, taps, B, use_matmul=False))(hh, d, g)
    r, i = scramble_spectra(Hb, 2 * B)
    return jnp.sum(jnp.abs(r)) + jnp.sum(jnp.abs(i))


def asm_mmH(hh):
    Hb = jax.vmap(lambda a, b, c: filter_partitions_mm(
        a, b, c, taps, B))(hh, d, g)
    r, i = scramble_spectra(Hb, 2 * B)
    return jnp.sum(jnp.abs(r)) + jnp.sum(jnp.abs(i))


def asm_mmT(hh):
    Hb = jax.vmap(lambda a, b, c: mm_tri(a, b, c))(hh, d, g)
    r, i = scramble_spectra(Hb, 2 * B)
    return jnp.sum(jnp.abs(r)) + jnp.sum(jnp.abs(i))


def full(_):
    return jnp.sum(jnp.abs(_partitioned_fn(table, xb, dirs, cfg)))


n1p = (2 * B) // 128
Fs2 = (n1p // 2 + 1) * 128
Hr = jax.device_put(
    (rng.standard_normal((nb, P * 2 * Fs2)) * 0.02).astype(np.float32))
Hi = jax.device_put(
    (rng.standard_normal((nb, P * 2 * Fs2)) * 0.02).astype(np.float32))
fz = jnp.zeros((nb,), jnp.float32)


def kern(_):
    y = fused_partitioned_step(xb, Hr, Hi, fz, B, P, precision="tri")
    return jnp.sum(jnp.abs(y))


VARIANTS = {"asm_fft": asm_fft, "asm_mmH": asm_mmH, "asm_mmT": asm_mmT,
            "full": full, "kern": kern}


def make(f):
    @jax.jit
    def one(hh):
        return f(hh)

    @jax.jit
    def rep(hh):
        def body(i, acc):
            return acc + f(hh + i * 1e-9)
        return jax.lax.fori_loop(0, K, body, 0.0)
    return one, rep


fns = {}
for name, f in VARIANTS.items():
    one, rep = make(f)
    float(np.asarray(one(h)))
    float(np.asarray(rep(h)))
    fns[name] = (one, rep)
    print(f"{name}: compiled ok", flush=True)

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

# parity of the tri assembly vs the fft chain (same linear map)
Ha = jax.vmap(lambda a, b, c: filter_partitions(
    a, b, c, taps, B, use_matmul=False))(h[:32], d[:32], g[:32])
Hb = jax.vmap(lambda a, b, c: mm_tri(a, b, c))(h[:32], d[:32], g[:32])
err = np.asarray(jnp.abs(Ha - Hb) ** 2).sum()
ref = np.asarray(jnp.abs(Ha) ** 2).sum()
print(f"tri-vs-fft assembly SNR: {10 * np.log10(ref / max(err, 1e-30)):.1f} dB",
      flush=True)
