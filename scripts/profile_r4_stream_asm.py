"""Round-4: asm-mode fused streaming step (in-kernel BRIR assembly) vs
the XLA fallback step it replaces, on chip: taps=2048 (P=9 at block
256), S=64 listeners. Compile check, on-chip parity, then chained
in-jit per-push device cost (the serving dependency structure).

Run alone on the chip: python scripts/profile_r4_stream_asm.py
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
from tinaural.models.streaming import (_batch_step_core, _use_fused_step,
                                       init_state)

taps, B, S, K = 2048, 256, 64, 8

table = jax.device_put(load_hrir_set("synthetic", taps=taps))
cfg_k = RenderConfig(stream_block=B)                   # asm-mode kernel
cfg_x = RenderConfig(stream_block=B, use_pallas=False)  # XLA step
print("fused eligible:", _use_fused_step(table, cfg_k, S), flush=True)

rng = np.random.default_rng(5)
xb = jax.device_put(rng.standard_normal((S, B)).astype(np.float32))
azs = jax.device_put(np.linspace(0, 350, S).astype(np.float32))
els = jax.device_put(np.zeros(S, np.float32))
state0 = jax.vmap(lambda _: init_state(table, cfg_k))(jnp.arange(S))


def make(cfg):
    @jax.jit
    def one(x):
        st, y = _batch_step_core(table, state0, x, azs, els, cfg)
        return jnp.sum(jnp.abs(y))

    @jax.jit
    def rep(x):
        def body(i, carry):
            st, acc = carry
            st, y = _batch_step_core(table, st, x + i * 1e-9,
                                     azs + i, els, cfg)
            return (st, acc + jnp.sum(jnp.abs(y)))
        _, acc = jax.lax.fori_loop(0, K, body, (state0, 0.0))
        return acc
    return one, rep


fns = {}
for name, cfg in (("asm_kernel", cfg_k), ("xla_step", cfg_x)):
    try:
        one, rep = make(cfg)
        float(np.asarray(one(xb)))
        float(np.asarray(rep(xb)))
        fns[name] = (one, rep)
        print(f"{name}: compiled + ran ok", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e).splitlines()[0][:180]}", flush=True)

if len(fns) == 2:
    @jax.jit
    def parity(x):
        _, yk = _batch_step_core(table, state0, x, azs, els, cfg_k)
        _, yx = _batch_step_core(table, state0, x, azs, els, cfg_x)
        return jnp.stack([jnp.sum((yk - yx) ** 2), jnp.sum(yx ** 2)])

    err, ref = [float(v) for v in np.asarray(parity(xb))]
    print(f"on-chip parity asm vs xla: "
          f"{10 * np.log10(ref / max(err, 1e-30)):.1f} dB", flush=True)

raw = {n: [] for n in fns}
for _ in range(8):
    for n, (one, rep) in fns.items():
        t0 = time.perf_counter(); float(np.asarray(one(xb)))
        t1 = time.perf_counter(); float(np.asarray(rep(xb)))
        t2 = time.perf_counter()
        raw[n].append(((t2 - t1) - (t1 - t0)) / (K - 1))
budget = B / 44100 * 1e3
for n in fns:
    med = float(np.median(raw[n][1:])) * 1e3
    cap = S * budget / med if med > 0 else float("inf")
    print(f"{n:10s}: {med:7.3f} ms/push serialized "
          f"(~{cap:,.0f} realtime BRIR listeners)  "
          f"raw={['%.2f' % (v * 1e3) for v in raw[n]]}", flush=True)
