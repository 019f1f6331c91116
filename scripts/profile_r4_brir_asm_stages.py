"""Round-4: stage split inside the BRIR fft-chain assembly (3.25 ms of
the 3.73 ms call — profile_r4_brir_assembly). Cumulative variants so
deltas give per-stage cost, interleaved serialized in-jit at the
official shape (nb=1024, B=512, taps=2048, P=5, L=4096):

  s1_planes    rfft_4096(h) · delay ramp · gain      (the ramped planes)
  s2_heff      + irfft_4096 → effective filter       (time domain)
  s3_parts     + segment pad + P×rfft_1024           (natural partitions)
  s4_scram     + scramble_spectra gather             (= the full assembly)

Run alone on the chip: python scripts/profile_r4_brir_asm_stages.py
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
from tinaural.ops.filters import (ALIGN_GUARD, DELAY_PAD, delay_ramp,
                                  next_pow2, _clip_delay)
from tinaural.ops.interp import interpolate
from tinaural.ops.pallas_kernels import scramble_spectra

B, taps = 512, 2048
N = 1 << 19
nb = N // B
T_pad = taps + DELAY_PAD
P = -(-T_pad // B)
L = next_pow2(T_pad)
K = 4

cfg = RenderConfig(stream_block=B)
table = jax.device_put(load_hrir_set("synthetic", taps=taps))
rng = np.random.default_rng(23)
dirs = jax.device_put(np.stack(
    [np.linspace(0, 350, nb) % 360,
     20 * np.sin(np.linspace(0, 9, nb))], axis=1).astype(np.float32))
h, d, g = jax.vmap(lambda a, e: interpolate(table, a, e, cfg))(
    dirs[:, 0], dirs[:, 1])
h, d, g = jax.device_put(h), jax.device_put(d), jax.device_put(g)


def planes(hh):
    dd = jnp.clip(d - ALIGN_GUARD, -ALIGN_GUARD, DELAY_PAD - 16.0)
    return jnp.fft.rfft(hh, n=L) * delay_ramp(L, dd) * g[..., None]


def heff(hh):
    return jnp.fft.irfft(planes(hh), n=L)[..., :T_pad]


def parts(hh):
    he = heff(hh)
    pz = jnp.zeros((nb, 2, P * B), he.dtype)
    pz = pz.at[..., :T_pad].set(he).reshape(nb, 2, P, B)
    return jnp.fft.rfft(pz, n=2 * B, axis=-1).transpose(0, 2, 1, 3)


def s1(hh):
    H = planes(hh)
    return jnp.sum(jnp.abs(H.real)) + jnp.sum(jnp.abs(H.imag))


def s2(hh):
    return jnp.sum(jnp.abs(heff(hh)))


def s3(hh):
    H = parts(hh)
    return jnp.sum(jnp.abs(H.real)) + jnp.sum(jnp.abs(H.imag))


def s4(hh):
    r, i = scramble_spectra(parts(hh), 2 * B)
    return jnp.sum(jnp.abs(r)) + jnp.sum(jnp.abs(i))


VARIANTS = {"s1_planes": s1, "s2_heff": s2, "s3_parts": s3, "s4_scram": s4}


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
meds = {}
for n in fns:
    meds[n] = float(np.median(raw[n][1:])) * 1e3
    print(f"{n:10s}: {meds[n]:7.3f} ms/call serialized  "
          f"raw={['%.2f' % (v * 1e3) for v in raw[n]]}", flush=True)
ks = list(meds)
for a, b in zip(ks, ks[1:]):
    print(f"stage delta {b} - {a}: {meds[b] - meds[a]:+.3f} ms", flush=True)
