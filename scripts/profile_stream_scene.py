"""On-chip A/B: fused streaming step vs XLA step; scene_chunk sweep.

Interleaved within one process (the only trustworthy comparison on the
tunnel). Run alone: python scripts/profile_stream_scene.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tinaural import RenderConfig, load_hrir_set
from tinaural.models import BatchedStream, Stream
from tinaural.models.renderer import _scene_fn
from tinaural.reference import golden

SR = 44100


def main():
    table = load_hrir_set("synthetic")
    rng = np.random.default_rng(0)
    B = 256

    # --- fused stream step: compiled parity vs golden first
    cfg_f = RenderConfig(stream_block=B, use_pallas=True)
    cfg_x = RenderConfig(stream_block=B, use_pallas=False)
    s_f = Stream(table, cfg_f)
    gold = golden.GoldenStream(table, RenderConfig(stream_block=B))
    x = rng.standard_normal(4 * B)
    outs, refs = [], []
    for i in range(4):
        xb = x[i * B:(i + 1) * B].astype(np.float32)
        az, el = 20.0 + 50 * i, 5.0 * i
        outs.append(np.asarray(s_f.push(xb, az, el), np.float64))
        refs.append(gold.push(x[i * B:(i + 1) * B], az, el))
    y, ref = np.concatenate(outs, 1), np.concatenate(refs, 1)
    snr = 10 * np.log10((ref**2).sum() / ((ref - y)**2).sum())
    print(f"fused stream step COMPILED vs golden: {snr:.1f} dB", flush=True)

    # --- push-cost A/B (pipelined marginal, state-chained)
    def push_cost(stream, n1=10, n2=50):
        xb = rng.standard_normal(B).astype(np.float32)

        def run(n):
            t0 = time.perf_counter()
            y = None
            for i in range(n):
                y = stream.push(xb, 30.0 + i, 0.0)
            float(np.asarray(y[0, -1]))
            return time.perf_counter() - t0

        run(5)
        t1 = min(run(n1) for _ in range(2))
        t2 = min(run(n2) for _ in range(2))
        return (t2 - t1) / (n2 - n1)

    for rnd in range(2):
        t_f = push_cost(Stream(table, cfg_f))
        t_x = push_cost(Stream(table, cfg_x))
        print(f"[round {rnd}] push fused {t_f*1e3:6.3f} ms | "
              f"xla {t_x*1e3:6.3f} ms", flush=True)

    # --- batched streams (serving): 64 listeners per launch
    for rnd in range(2):
        for name, cfg in (("fused", cfg_f), ("xla", cfg_x)):
            bs = BatchedStream(table, 64, cfg)
            blocks = rng.standard_normal((64, B)).astype(np.float32)
            azs = np.linspace(0, 350, 64).astype(np.float32)
            els = np.zeros(64, np.float32)

            def run(n):
                t0 = time.perf_counter()
                y = None
                for _ in range(n):
                    y = bs.push(blocks, azs, els)
                float(np.asarray(y[0, 0, -1]))
                return time.perf_counter() - t0

            run(3)
            t1 = min(run(4) for _ in range(2))
            t2 = min(run(16) for _ in range(2))
            per = (t2 - t1) / 12
            print(f"[round {rnd}] batched64 {name}: {per*1e3:7.3f} ms/push "
                  f"({64*B/SR/per:8.0f} agg audio-sec/s)", flush=True)

    # --- scene_chunk sweep (64 moving sources)
    S, N, Bb = 64, 1 << 17, 1024
    nb = N // Bb
    xbs = jax.device_put(rng.standard_normal((S, nb, Bb)).astype(np.float32))
    dirs = jax.device_put(rng.uniform(0, 360, (S, nb, 2)).astype(np.float32))
    tbl = jax.device_put(table)

    def marginal(call, k1=1, k2=5, reps=3):
        def batch(k):
            t0 = time.perf_counter()
            y = None
            for _ in range(k):
                y = call()
            float(np.asarray(y[0, -1]))
            return time.perf_counter() - t0

        batch(1)
        batch(1)
        ests = []
        for _ in range(reps):
            ests.append((batch(k2) - batch(k1)) / (k2 - k1))
        return float(np.median(ests))

    cfgs = {ch: RenderConfig(block_size=Bb, scene_chunk=ch)
            for ch in (8, 16, 32, 64)}
    calls = {ch: (lambda c=c: _scene_fn(tbl, xbs, dirs, c))
             for ch, c in cfgs.items()}
    for ch, call in calls.items():
        call()
        print(f"compiled scene_chunk={ch}", flush=True)
    for rnd in range(2):
        for ch, call in calls.items():
            t = marginal(call)
            print(f"[round {rnd}] scene_chunk={ch:2d}: {t*1e3:8.2f} ms "
                  f"({S*N/SR/t:8.0f} agg audio-sec/s)", flush=True)


if __name__ == "__main__":
    main()
