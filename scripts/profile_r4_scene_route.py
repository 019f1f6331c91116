"""Round-4: route-level check of the new scene dir_rate routing —
`_scene_fn` at RenderConfig(dir_rate=1) vs (dir_rate=4) (the latter now
takes the chunk-64 unique-assembly fast path), official bench shape,
interleaved in one process, serialized in-jit device time + pipelined
marginal (the official bench's estimator).

Run alone on the chip: python scripts/profile_r4_scene_route.py
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

from tinaural import RenderConfig, load_hrir_set
from tinaural.models.renderer import _scene_fn

SR = 44100
K = 4


def main():
    table = jax.device_put(load_hrir_set("synthetic"))
    rng = np.random.default_rng(2)
    S, N, B = 64, 1 << 17, 1024
    nb = N // B
    xbs = jax.device_put(rng.standard_normal((S, nb, B)).astype(np.float32))
    dirs = jax.device_put(np.stack(
        [rng.uniform(0, 360, (S, nb)), rng.uniform(-40, 90, (S, nb))],
        axis=-1).astype(np.float32))

    def make(k):
        cfg = RenderConfig(block_size=B, dir_rate=k)

        @jax.jit
        def one(x):
            return jnp.sum(jnp.abs(_scene_fn(table, x, dirs, cfg)))

        @jax.jit
        def rep(x):
            def body(i, acc):
                return acc + jnp.sum(jnp.abs(
                    _scene_fn(table, x + i * 1e-9, dirs, cfg)))
            return jax.lax.fori_loop(0, K, body, 0.0)
        return one, rep

    fns = {}
    for k in (1, 4):
        try:
            one, rep = make(k)
            float(np.asarray(one(xbs)))
            float(np.asarray(rep(xbs)))
            fns[k] = (one, rep)
            print(f"dir_rate {k}: compiled ok", flush=True)
        except Exception as e:
            print(f"dir_rate {k}: FAILED {str(e).splitlines()[0][:140]}",
                  flush=True)

    def est(one, rep):
        t0 = time.perf_counter(); float(np.asarray(one(xbs)))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(np.asarray(rep(xbs)))
        tk = time.perf_counter() - t0
        return (tk - t1) / (K - 1)

    res = {k: [] for k in fns}
    for _ in range(6):
        for k, (o, r) in fns.items():
            res[k].append(est(o, r))
    for k, es in res.items():
        m = float(np.median(es))
        print(f"dir_rate {k}: {m*1e3:7.3f} ms ({S * N / SR / m:8.0f} agg "
              f"a-s/s) raw={[f'{e*1e3:.2f}' for e in es]}")


if __name__ == "__main__":
    main()
