"""On-chip compiled-kernel parity check: fused_assembly_mac vs the jnp
chain on the real backend. Prints one JSON line {"snr_db": N}.

Run by tests/test_perf_regression.py in a subprocess (the test suite
itself pins JAX to CPU in conftest.py).
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tinaural import RenderConfig, load_hrir_set
from tinaural.ops.filters import DELAY_PAD, filter_spectrum_mm, next_pow2
from tinaural.ops.interp import interpolate
from tinaural.ops.pallas_kernels import fused_assembly_mac


def main():
    cfg = RenderConfig()
    table = load_hrir_set("synthetic")
    tbl = jax.device_put(table)
    taps = np.asarray(table.h).shape[-1]
    B = 1024
    n_fft = next_pow2(B + taps + DELAY_PAD - 1)
    nb = 128
    rng = np.random.default_rng(11)
    dirs = np.stack([rng.uniform(0, 360, nb), rng.uniform(-40, 90, nb)],
                    axis=1).astype(np.float32)
    h, d, g = jax.jit(jax.vmap(lambda a, e: interpolate(tbl, a, e, cfg)))(
        jnp.asarray(dirs[:, 0]), jnp.asarray(dirs[:, 1]))
    Xu = jnp.fft.rfft(jnp.asarray(
        rng.standard_normal((nb, n_fft)).astype(np.float32)))
    Xd = jnp.fft.rfft(jnp.asarray(
        rng.standard_normal((nb, n_fft)).astype(np.float32)))
    first = jnp.zeros(nb, jnp.float32).at[0].set(1.0)

    Y = fused_assembly_mac(h, d, g, Xu, Xd, first, taps, n_fft,
                           crossfade=True)

    @jax.jit
    def ref_fn(h, d, g, Xu, Xd):
        Hc = filter_spectrum_mm(h, d, g, taps, n_fft)
        Hp = jnp.concatenate([Hc[:1], Hc[:-1]], axis=0)
        return Xu[:, None, :] * Hc + Xd[:, None, :] * Hp

    ref = ref_fn(h, d, g, Xu, Xd)
    rr = np.asarray(jnp.real(ref), np.float64)
    ri = np.asarray(jnp.imag(ref), np.float64)
    yr = np.asarray(jnp.real(Y), np.float64)
    yi = np.asarray(jnp.imag(Y), np.float64)
    snr = 10 * np.log10((rr**2 + ri**2).sum()
                        / ((rr - yr)**2 + (ri - yi)**2).sum())
    print(json.dumps({"snr_db": float(snr),
                      "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
