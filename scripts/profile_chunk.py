"""Interleaved A/B of the assembly kernel's chunk size (grid-step rows).
Run alone: python scripts/profile_chunk.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tinaural import RenderConfig, load_hrir_set
from tinaural.models import BinauralRenderer
from tinaural.models.renderer import _rfft_updown
from tinaural.ops.filters import DELAY_PAD, next_pow2
from tinaural.ops.interp import interpolate
from tinaural.ops.pallas_kernels import fused_assembly_mac
from tinaural.utils.profiling import marginal_cost

B, N = 1024, 1 << 21
NB = N // B
CFG = RenderConfig(block_size=B)


def main():
    table = load_hrir_set("synthetic")
    tbl = BinauralRenderer(table, CFG).table
    taps = tbl.h.shape[-1]
    n_fft = next_pow2(B + taps + DELAY_PAD - 1)
    rng = np.random.default_rng(0)
    dirs = np.stack([np.linspace(0, 350, NB) % 360,
                     40 * np.sin(np.linspace(0, 20, NB))], axis=1).astype(np.float32)
    h, d, g = jax.jit(jax.vmap(lambda a, e: interpolate(tbl, a, e, CFG)))(
        jnp.asarray(dirs[:, 0]), jnp.asarray(dirs[:, 1]))
    xb = jax.device_put(rng.standard_normal((NB, B)).astype(np.float32))
    Xu, Xd = jax.jit(lambda x: _rfft_updown(x, B, n_fft, CFG))(xb)
    Xu, Xd = jax.device_put((Xu, Xd))
    first = jnp.zeros(NB, jnp.float32).at[0].set(1.0)

    calls = {}
    for ch in (32, 64, 128):
        fn = jax.jit(lambda h, d, g, Xu, Xd, c=ch: (lambda Y: jnp.sum(
            jnp.real(Y)) + jnp.sum(jnp.imag(Y)))(fused_assembly_mac(
                h, d, g, Xu, Xd, first, taps, n_fft, chunk=c)))
        float(np.asarray(fn(h, d, g, Xu, Xd)))
        calls[ch] = fn
        print(f"compiled chunk={ch}", flush=True)
    res = {ch: [] for ch in calls}
    for rnd in range(4):
        for ch, fn in calls.items():
            res[ch].append(marginal_cost(
                lambda: fn(h, d, g, Xu, Xd), reps=3))
    for ch, ts in res.items():
        med = float(np.median(ts))
        print(f"chunk={ch:3d} {med*1e3:8.3f} ms  "
              f"[{min(ts)*1e3:7.3f},{max(ts)*1e3:8.3f}]", flush=True)


if __name__ == "__main__":
    main()
