"""Round-5 (round-4 VERDICT next #4): the BRIR path reads 4.3% of bf16
peak by its own roofline — bandwidth/latency-structured — and the chunk
ladder is the named remaining lever. Sweep the launch chunk of BOTH
partitioned kernels at the official w_brir shape (taps=2048, B=512,
P=5, nb=1024, tri):

  * `fused_partitioned_assembled` — the DEFAULT route (part_assembly=
    "kernel"): in-kernel BRIR filter assembly from raw (h, d, g) rows.
  * `fused_partitioned_step` — the pre-assembled-H route (the r4 script
    only covered this one).

Interleaved same-process serialized in-jit device time (the only
trustworthy A/B form on this tunnel — docs/BENCH_NOTES.md), chunks
gated by the vmem estimate so a measured-bad point is pre-filtered,
plus a compile check for each admitted chunk.

Run alone on the chip: python scripts/profile_r5_part_chunk.py
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

from tinaural.ops.pallas_kernels import (fused_partitioned_assembled,
                                         fused_partitioned_step,
                                         partitioned_asm_vmem_bytes)
from tinaural.ops.vmem import ASM_BUDGET

taps, B, P, nb = 2048, 512, 5, 1024
K = 4  # serialized repeats inside one jit
n1p = (2 * B) // 128
Fs2 = (n1p // 2 + 1) * 128

rng = np.random.default_rng(13)
xb = jax.device_put(rng.standard_normal((nb, B)).astype(np.float32))
h = jax.device_put(
    (rng.standard_normal((nb, 2, taps)) * 0.02).astype(np.float32))
d = jax.device_put(rng.uniform(0, 2, (nb, 2)).astype(np.float32))
g = jax.device_put(rng.uniform(0.5, 1, (nb, 2)).astype(np.float32))
Hr = jax.device_put(
    (rng.standard_normal((nb, P * 2 * Fs2)) * 0.02).astype(np.float32))
Hi = jax.device_put(
    (rng.standard_normal((nb, P * 2 * Fs2)) * 0.02).astype(np.float32))
first = jnp.zeros((nb,), jnp.float32).at[0].set(1.0)


def make_asm(ch):
    def call(x, i):
        return fused_partitioned_assembled(
            x + i * 1e-9, h, d, g, first, taps, B, P,
            precision="tri", chunk=ch)

    return _pair(call)


def make_step(ch):
    def call(x, i):
        return fused_partitioned_step(
            x + i * 1e-9, Hr, Hi, first, B, P, precision="tri", chunk=ch)

    return _pair(call)


def _pair(call):
    @jax.jit
    def one(x):
        return jnp.sum(jnp.abs(call(x, 0)))

    @jax.jit
    def rep(x):
        def body(i, acc):
            return acc + jnp.sum(jnp.abs(call(x, i)))
        return jax.lax.fori_loop(0, K, body, 0.0)

    return one, rep


def fence(v):
    return float(np.asarray(v))


fns = {}
for ch in (32, 64, 96, 128):
    est = partitioned_asm_vmem_bytes(taps, B, P, chunk=ch)
    tag = f"asm_c{ch}"
    # over-ASM_BUDGET chunks are probed anyway: the budget is an
    # empirical pre-filter (estimates overcount Mosaic's liveness reuse
    # ~2x), and a compile success + A/B win here is exactly the evidence
    # that would revise it (how round 4 calibrated RENDER_BUDGET).
    over = " (OVER-budget probe)" if est >= ASM_BUDGET else ""
    try:
        one, rep = make_asm(ch)
        fence(one(xb)), fence(rep(xb))
        fns[tag] = (one, rep)
        print(f"{tag}: compiled ok ({est / (1 << 20):.1f} MiB est){over}",
              flush=True)
    except Exception as e:
        print(f"{tag}: FAILED ({est / (1 << 20):.1f} MiB est){over} "
              f"{str(e).splitlines()[0][:150]}", flush=True)
for ch in (32, 64, 96):
    tag = f"step_c{ch}"
    try:
        one, rep = make_step(ch)
        fence(one(xb)), fence(rep(xb))
        fns[tag] = (one, rep)
        print(f"{tag}: compiled ok", flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {str(e).splitlines()[0][:150]}", flush=True)

# serialized device time: rep (K calls) minus one, interleaved rounds
raw = {tag: [] for tag in fns}
for _ in range(6):
    for tag, (one, rep) in fns.items():
        t0 = time.perf_counter(); fence(one(xb)); t1 = time.perf_counter()
        fence(rep(xb)); t2 = time.perf_counter()
        raw[tag].append(((t2 - t1) - (t1 - t0)) / (K - 1))
for tag in fns:
    med = float(np.median(raw[tag][1:])) * 1e3
    print(f"{tag:9s}: {med:7.3f} ms/call serialized  "
          f"raw={['%.2f' % (v * 1e3) for v in raw[tag]]}", flush=True)
