"""Round-4: kernel dir_rate 4 vs 8 at chunk 64 (cu = chunk/k = 8 = the
f32 tile minimum, so k=8 is newly reachable at the chunk-64 launch).
Interleaved in one process, serialized in-jit device time.

  python scripts/profile_r4_dir8.py          # 64-src moving scene
  python scripts/profile_r4_dir8.py --traj   # S=1 trajectory (2^23)

MEASURED (2026-08-17): a wash both ways — scene 1.380 ms (dir8) vs
1.416 (dir4), traj 1.544 vs 1.561 — ~1–2.5%, inside the raw spread.
Past k=4 unique-filter assembly is no longer the bottleneck; the
routing cap stays min(dir_rate, 4). (First traj attempt at 2^20
measured NEGATIVE marginals — under the tunnel dispatch floor; always
probe at the official 2^23.)
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

from tinaural import load_hrir_set
from tinaural.ops.interp import direction_weights
from tinaural.ops.pallas_kernels import fused_block_render, gather_tables

SR = 44100
K = 4


def main():
    traj = "--traj" in sys.argv
    table = jax.device_put(load_hrir_set("synthetic"))
    rng = np.random.default_rng(5)
    if traj:
        # 2^23 = the official headline size: 2^20 per-call device time
        # sits under the tunnel dispatch floor and the marginals come
        # back negative (CLAUDE.md measurement rules).
        S, N, B = 1, 1 << 23, 1024
    else:
        S, N, B = 64, 1 << 17, 1024
    nb = N // B
    taps, n_fft = 128, 2048
    xbs = jax.device_put(rng.standard_normal((S, nb, B)).astype(np.float32))
    dirs = np.stack([rng.uniform(0, 360, (S, nb)),
                     rng.uniform(-40, 90, (S, nb))], axis=-1).astype(np.float32)
    A = table.h.shape[1]
    ht, dg = gather_tables(table.h, table.delays, table.gains, taps, n_fft)

    def weights(d):
        flat = jnp.asarray(np.ascontiguousarray(d).reshape(S * nb, 2))
        eidx, aidx, w = jax.vmap(lambda a, e: direction_weights(
            table.elevs, table.az_counts, a, e, "bilinear"))(flat[:, 0],
                                                             flat[:, 1])
        idx = (eidx * A + aidx).astype(jnp.float32).reshape(S, nb, 4)
        return idx, w.astype(jnp.float32).reshape(S, nb, 4)

    iw = {k: weights(dirs[:, (np.arange(nb) // k) * k]) for k in (4, 8)}

    def make(k):
        idx, w4 = iw[k]

        def call(x):
            return fused_block_render(None, None, None, x, taps, n_fft,
                                      precision="tri", idx=idx, w=w4,
                                      ht=ht, dg=dg, chunk=64, dir_rate=k)

        @jax.jit
        def one(x):
            return jnp.sum(jnp.abs(call(x)))

        @jax.jit
        def rep(x):
            def body(i, acc):
                return acc + jnp.sum(jnp.abs(call(x + i * 1e-9)))
            return jax.lax.fori_loop(0, K, body, 0.0)
        return one, rep

    fns = {}
    for k in (4, 8):
        try:
            one, rep = make(k)
            float(np.asarray(one(xbs)))
            float(np.asarray(rep(xbs)))
            fns[k] = (one, rep)
            print(f"dir {k}: compiled ok", flush=True)
        except Exception as e:
            print(f"dir {k}: FAILED {str(e).splitlines()[0][:140]}",
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
    name = "traj" if traj else "scene"
    for k, es in res.items():
        m = float(np.median(es))
        print(f"{name} dir {k}: {m*1e3:7.3f} ms "
              f"({S * N / SR / m:8.0f} a-s/s) "
              f"raw={[f'{e*1e3:.2f}' for e in es]}")


if __name__ == "__main__":
    main()
