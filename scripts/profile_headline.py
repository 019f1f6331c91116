"""Interleaved headline A/B: the ONLY trustworthy comparison on this
tunnel (cross-process and even cross-minute numbers swing far beyond the
documented ±25%; within-process interleaved medians are stable).

Times the full jitted trajectory render (2^21 samples, B=1024) under
fft_pack × use_pallas variants, interleaved over several rounds.
Run alone: python scripts/profile_headline.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

from tinaural import RenderConfig, load_hrir_set
from tinaural.models import BinauralRenderer
from tinaural.models.renderer import _trajectory_fn

B = 1024
N = 1 << 21
NB = N // B
SR = 44100


def marginal(call, k1=2, k2=12, reps=3):
    from tinaural.utils.profiling import marginal_cost

    return marginal_cost(call, k1=k1, k2=k2, reps=reps)


def main():
    table = load_hrir_set("synthetic")
    rng = np.random.default_rng(0)
    xb = jax.device_put(rng.standard_normal((NB, B)).astype(np.float32))
    dirs = jax.device_put(
        np.stack([np.linspace(0, 350, NB) % 360,
                  40 * np.sin(np.linspace(0, 20, NB))], axis=1).astype(np.float32))

    # use_pallas must be PINNED per variant (it defaults True since the
    # round-2 flip — an unpinned "xla" label would silently run the kernel)
    variants = {
        "xla_nopack": RenderConfig(block_size=B, fft_pack="off",
                                   use_pallas=False),
        "xla_fwd": RenderConfig(block_size=B, fft_pack="fwd",
                                use_pallas=False),
        "xla_both": RenderConfig(block_size=B, fft_pack="both",
                                 use_pallas=False),
        "pallas_fwd": RenderConfig(block_size=B, fft_pack="fwd",
                                   use_pallas=True),
        "pallas_both": RenderConfig(block_size=B, fft_pack="both",
                                    use_pallas=True),
    }
    tbl = BinauralRenderer(table, next(iter(variants.values()))).table

    calls = {}
    for name, cfg in variants.items():
        calls[name] = (lambda c=cfg: _trajectory_fn(tbl, xb, dirs, c))
        calls[name]()  # compile
        float(np.asarray(calls[name]()[0, -1]))
        print(f"compiled {name}", flush=True)

    results = {n: [] for n in calls}
    for rnd in range(4):
        for name, call in calls.items():
            results[name].append(marginal(call))
    for name, ts in results.items():
        med = float(np.median(ts))
        lo, hi = min(ts), max(ts)
        print(f"{name:12s} {med*1e3:8.3f} ms  [{lo*1e3:7.3f},{hi*1e3:8.3f}]"
              f"  {N/SR/med:8.0f} audio-sec/s", flush=True)


if __name__ == "__main__":
    main()
