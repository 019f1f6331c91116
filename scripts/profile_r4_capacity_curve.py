"""Round-4: sustained serving-capacity curve — push_many marginal at
S ∈ {128, 256, 512, 1024} listeners × K ∈ {32, 64} blocks/dispatch,
device-staged inputs (the bench's sustained regime). The first official
capture found S=256 (28.1k listeners) beating S=1024 (19.9k); find the
true max of the curve before deciding whether w_capacity should carry
another point.

Run alone on the chip: python scripts/profile_r4_capacity_curve.py
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

from tinaural.config import RenderConfig
from tinaural.data import load_hrir_set
from tinaural.models import BatchedStream

SR, B = 44100, 256
table = load_hrir_set("synthetic")


def cost(S, K):
    bs = BatchedStream(table, S, RenderConfig(stream_block=B))
    rng = np.random.default_rng(8)
    blocks = jax.device_put(
        rng.standard_normal((K, S, B)).astype(np.float32))
    azs = jax.device_put(
        (np.linspace(0, 350, S, dtype=np.float32)[None]
         + 2.0 * np.arange(K, dtype=np.float32)[:, None]) % 360.0)
    els = jax.device_put(np.zeros((K, S), np.float32))

    def fenced(n):
        t0 = time.perf_counter()
        y = None
        for _ in range(n):
            y = bs.push_many(blocks, azs, els)
        float(np.asarray(y[-1, 0, 0, -1]))
        return time.perf_counter() - t0

    fenced(1)  # compile
    fenced(2)
    fenced(1), fenced(4)
    ests = [(fenced(4) - fenced(1)) / 3 for _ in range(5)]
    pos = [e for e in ests if e > 0]
    per = (float(np.median(pos)) if len(pos) >= 3
           else min(fenced(4) for _ in range(2)) / 4) / K
    return per, ests


for S in (128, 256, 512, 1024):
    for K in (32, 64):
        per, ests = cost(S, K)
        cap = S * (B / SR) / per
        print(f"S={S:5d} K={K:3d}: {per * 1e3:7.4f} ms/block  "
              f"{cap:9.0f} listeners  "
              f"raw={['%.2f' % (e * 1e3) for e in ests]}", flush=True)
