"""Round-4: the in-kernel BRIR assembly route (part_assembly="kernel")
vs the packed-XLA assembly route, on chip at the official w_brir shape
(nb=1024, B=512, taps=2048, P=5, tri). Compile check, on-chip parity,
then interleaved serialized in-jit A/B of the full `_partitioned_fn`.

Run alone on the chip: python scripts/profile_r4_asm_kernel.py
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

B, taps = 512, 2048
N = 1 << 19
nb = N // B
K = 4

table = jax.device_put(load_hrir_set("synthetic", taps=taps))
rng = np.random.default_rng(31)
xb = jax.device_put(rng.standard_normal((nb, B)).astype(np.float32))
dirs = jax.device_put(np.stack(
    [np.linspace(0, 350, nb) % 360,
     20 * np.sin(np.linspace(0, 9, nb))], axis=1).astype(np.float32))

cfgs = {"xla": RenderConfig(stream_block=B, part_assembly="xla"),
        "kern": RenderConfig(stream_block=B, part_assembly="kernel")}


def make(cfg):
    @jax.jit
    def one(x):
        return jnp.sum(jnp.abs(_partitioned_fn(table, x, dirs, cfg)))

    @jax.jit
    def rep(x):
        def body(i, acc):
            return acc + jnp.sum(jnp.abs(
                _partitioned_fn(table, x + i * 1e-9, dirs, cfg)))
        return jax.lax.fori_loop(0, K, body, 0.0)
    return one, rep


fns = {}
for name, cfg in cfgs.items():
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
        yx = _partitioned_fn(table, x, dirs, cfgs["xla"])
        yk = _partitioned_fn(table, x, dirs, cfgs["kern"])
        return jnp.stack([jnp.sum((yx - yk) ** 2), jnp.sum(yx ** 2)])

    err, ref = [float(v) for v in np.asarray(parity(xb))]
    print(f"on-chip parity kern vs xla: "
          f"{10 * np.log10(ref / max(err, 1e-30)):.1f} dB", flush=True)

raw = {n: [] for n in fns}
for _ in range(8):
    for n, (one, rep) in fns.items():
        t0 = time.perf_counter(); float(np.asarray(one(xb)))
        t1 = time.perf_counter(); float(np.asarray(rep(xb)))
        t2 = time.perf_counter()
        raw[n].append(((t2 - t1) - (t1 - t0)) / (K - 1))
for n in fns:
    med = float(np.median(raw[n][1:])) * 1e3
    rt = (N / 44100) / (med / 1e3)
    print(f"{n:5s}: {med:7.3f} ms/call serialized ({rt:,.0f}x RT)  "
          f"raw={['%.2f' % (v * 1e3) for v in raw[n]]}", flush=True)
