"""Round-5: `stream_update_rate` on chip — push_many (the sustained
BRIR-serving route) at k=1 vs 2 vs 4 on 2048-tap asm-mode streams.
The held pushes skip the in-kernel filter-assembly chain (the dominant
per-push BRIR cost by the round-4 stage split), so the k>1 bursts
should approach the hold-step floor; this script measures where that
floor is and whether the lever is worth a bench extra + perf gate.

Interleaved same-process A/B (BENCH_NOTES round-2 methodology); the
K=8-burst jit is the measured unit, well above the tunnel's ~0.6-1 ms
dispatch floor. Run alone on the chip:
    python scripts/profile_r5_update_rate.py
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
from tinaural.models.streaming import (_batch_scan_core, _use_fused_step,
                                       init_state)

taps, B, S, K = 2048, 256, 64, 8
RATES = (1, 2, 4)

table = jax.device_put(load_hrir_set("synthetic", taps=taps))
rng = np.random.default_rng(55)
xbs = jax.device_put(rng.standard_normal((K, S, B)).astype(np.float32))
azs = jax.device_put(
    (np.linspace(0, 350, K * S).reshape(K, S)).astype(np.float32))
els = jax.device_put(np.zeros((K, S), np.float32))
state0 = jax.vmap(lambda _: init_state(
    table, RenderConfig(stream_block=B)))(jnp.arange(S))


def make(k):
    cfg = RenderConfig(stream_block=B, stream_update_rate=k)
    assert _use_fused_step(table, cfg, S), "asm kernel must be the route"

    @jax.jit
    def burst(x):
        st, ys = _batch_scan_core(table, state0, x, azs, els, cfg)
        return jnp.sum(jnp.abs(ys))

    return burst


fns = {}
ref_sum = None
for k in RATES:
    try:
        fn = make(k)
        v = float(np.asarray(fn(xbs)))
        fns[k] = fn
        if k == 1:
            ref_sum = v
        print(f"k={k}: compiled + ran ok (sum={v:.4f})", flush=True)
    except Exception as e:
        print(f"k={k}: FAILED {str(e).splitlines()[0][:180]}", flush=True)

# on-chip parity: k=4 burst vs the golden-equivalent k=1 burst on the
# push-snapped direction track (the RenderConfig equivalence claim)
if 1 in fns and 4 in fns:
    snap = (np.arange(K) // 4) * 4
    az_s = jax.device_put(np.asarray(azs)[snap])
    el_s = jax.device_put(np.asarray(els)[snap])

    @jax.jit
    def parity(x):
        cfg1 = RenderConfig(stream_block=B)
        cfg4 = RenderConfig(stream_block=B, stream_update_rate=4)
        _, y4 = _batch_scan_core(table, state0, x, azs, els, cfg4)
        _, y1 = _batch_scan_core(table, state0, x, az_s, el_s, cfg1)
        return jnp.stack([jnp.sum((y4 - y1) ** 2), jnp.sum(y1 ** 2)])

    err, ref = [float(v) for v in np.asarray(parity(xbs))]
    print(f"on-chip parity k=4 vs snapped k=1: "
          f"{10 * np.log10(ref / max(err, 1e-30)):.1f} dB", flush=True)

raw = {k: [] for k in fns}
for _ in range(8):
    for k, fn in fns.items():
        t0 = time.perf_counter()
        float(np.asarray(fn(xbs)))
        raw[k].append(time.perf_counter() - t0)

budget = B / 44100 * 1e3  # ms of audio per push
base = None
for k in fns:
    med = float(np.median(raw[k][1:])) * 1e3 / K  # ms per push
    if k == 1:
        base = med
    cap = S * budget / med if med > 0 else float("inf")
    rel = f"  ({base / med:.2f}x vs k=1)" if base and k != 1 else ""
    print(f"k={k}: {med:7.3f} ms/push in-burst "
          f"(~{cap:,.0f} realtime BRIR listeners){rel}  "
          f"raw_burst_ms={['%.2f' % (v * 1e3) for v in raw[k]]}", flush=True)
