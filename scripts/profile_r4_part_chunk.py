"""Round-4: fused_partitioned_step (BRIR) chunk 32 vs 64 vs 96 at the
official w_brir kernel shape (nb=1024 blocks of B=512, P=5, tri), both
serialized in-jit device time and a sanity one-shot. The render-route
ladder won +10-22% at 96; the BRIR kernel reads its H rows (P·2·Fs2 =
6,400 lanes/block) from HBM every step, so it may be bandwidth-bound
and chunk-insensitive — measure, don't assume.

Run alone on the chip: python scripts/profile_r4_part_chunk.py
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

from tinaural.ops.pallas_kernels import fused_partitioned_step

B, P, nb = 512, 5, 1024
K = 4  # serialized repeats inside one jit
n1p = (2 * B) // 128
Fs2 = (n1p // 2 + 1) * 128

rng = np.random.default_rng(13)
xb = jax.device_put(rng.standard_normal((nb, B)).astype(np.float32))
Hr = jax.device_put(
    (rng.standard_normal((nb, P * 2 * Fs2)) * 0.02).astype(np.float32))
Hi = jax.device_put(
    (rng.standard_normal((nb, P * 2 * Fs2)) * 0.02).astype(np.float32))
first = jnp.zeros((nb,), jnp.float32)


def make(ch):
    @jax.jit
    def one(x):
        y = fused_partitioned_step(x, Hr, Hi, first, B, P,
                                   precision="tri", chunk=ch)
        return jnp.sum(jnp.abs(y))

    @jax.jit
    def rep(x):
        def body(i, acc):
            y = fused_partitioned_step(x + i * 1e-9, Hr, Hi, first, B, P,
                                       precision="tri", chunk=ch)
            return acc + jnp.sum(jnp.abs(y))
        return jax.lax.fori_loop(0, K, body, 0.0)

    return one, rep


def fence(v):
    return float(np.asarray(v))


fns = {}
for ch in (32, 64, 96):
    try:
        one, rep = make(ch)
        fence(one(xb))
        fence(rep(xb))
        fns[ch] = (one, rep)
        print(f"chunk {ch}: compiled ok", flush=True)
    except Exception as e:
        print(f"chunk {ch}: FAILED {str(e).splitlines()[0][:150]}", flush=True)

# serialized device time: rep (K calls) minus one, interleaved rounds
raw = {ch: [] for ch in fns}
for _ in range(6):
    for ch, (one, rep) in fns.items():
        t0 = time.perf_counter(); fence(one(xb)); t1 = time.perf_counter()
        fence(rep(xb)); t2 = time.perf_counter()
        raw[ch].append(((t2 - t1) - (t1 - t0)) / (K - 1))
for ch in fns:
    med = float(np.median(raw[ch][1:])) * 1e3
    print(f"chunk {ch:3d}: {med:7.3f} ms/call serialized  "
          f"raw={['%.2f' % (v * 1e3) for v in raw[ch]]}", flush=True)
