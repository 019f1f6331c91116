"""On-chip compiled-kernel parity check: every fused Pallas pipeline vs
the pure-XLA chain on the real backend (Mosaic tiling/precision
assumptions get their own gate — interpret-mode CI tests can't see them).
Prints one JSON line {"snr_db": N, ...} where snr_db is the MINIMUM
across kernels.

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
from tinaural.models.renderer import (_partitioned_fn, _scene_fn,
                                      _trajectory_fn)
from tinaural.ops.filters import DELAY_PAD, filter_spectrum_mm, next_pow2
from tinaural.ops.interp import interpolate
from tinaural.ops.pallas_kernels import fused_assembly_mac


def _snr(ref, y):
    # axon cannot d2h complex arrays — split re/im ON DEVICE first
    # (machine quirk, see CLAUDE.md), then compare in f64 on host.
    def planes(z):
        if jnp.iscomplexobj(z):
            return (np.asarray(jnp.real(z), np.float64),
                    np.asarray(jnp.imag(z), np.float64))
        return (np.asarray(z, np.float64), 0.0)

    rr, ri = planes(ref)
    yr, yi = planes(y)
    return float(10 * np.log10(
        (np.sum(rr**2) + np.sum(ri**2))
        / (np.sum((rr - yr) ** 2) + np.sum((ri - yi) ** 2))))


def main():
    cfg = RenderConfig()  # fused pipeline default
    cfg_x = RenderConfig(use_pallas=False)  # pure XLA
    table = load_hrir_set("synthetic")
    tbl = jax.device_put(table)
    taps = np.asarray(table.h).shape[-1]
    B = 1024
    n_fft = next_pow2(B + taps + DELAY_PAD - 1)
    nb = 128
    rng = np.random.default_rng(11)
    out = {"backend": jax.default_backend()}

    # 1. legacy natural-order assembly+MAC kernel vs the jnp chain
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

    out["assembly_mac_db"] = _snr(ref_fn(h, d, g, Xu, Xd), Y)

    # 2. fully-fused block pipeline (fwd FFT + assembly + MAC kernel →
    #    inverse+OLA kernel) vs the pure-XLA trajectory render
    xb = jnp.asarray(rng.standard_normal((nb, B)).astype(np.float32))
    dj = jnp.asarray(dirs)
    out["block_pipeline_db"] = _snr(_trajectory_fn(tbl, xb, dj, cfg_x),
                                    _trajectory_fn(tbl, xb, dj, cfg))

    # 3. scene mixdown kernel vs the XLA scene path
    S, nbs = 8, 16
    xbs = jnp.asarray(rng.standard_normal((S, nbs, B)).astype(np.float32))
    dsc = jnp.asarray(rng.uniform(0, 360, (S, nbs, 2)).astype(np.float32))
    out["scene_mix_db"] = _snr(_scene_fn(tbl, xbs, dsc, cfg_x),
                               _scene_fn(tbl, xbs, dsc, cfg))

    # 4. fused partitioned kernel (BRIR regime, P=9) vs the XLA path
    t2 = jax.device_put(load_hrir_set("synthetic", taps=2048))
    Bs = 256
    cfg_s = RenderConfig(stream_block=Bs)
    cfg_sx = RenderConfig(stream_block=Bs, use_pallas=False)
    nbb = 32
    xb2 = jnp.asarray(rng.standard_normal((nbb, Bs)).astype(np.float32))
    d2 = jnp.asarray(np.stack([np.linspace(0, 350, nbb) % 360,
                               np.linspace(-30, 60, nbb)],
                              axis=1).astype(np.float32))
    out["partitioned_db"] = _snr(_partitioned_fn(t2, xb2, d2, cfg_sx),
                                 _partitioned_fn(t2, xb2, d2, cfg_s))

    # 5. streaming step in IN-KERNEL ASSEMBLY mode (2048-tap per-listener
    #    BRIR serving; round-4 VERDICT missing #2: this mode had no
    #    on-chip compile/parity evidence) and, at stream_update_rate=4,
    #    the round-5 no-assembly hold kernel — both as push_many bursts
    #    (the production scan) vs the XLA scan.
    from tinaural.models.streaming import _batch_scan_core, init_state
    from tinaural.ops import vmem

    S5, K5 = 8, 4
    assert vmem.stream_mode(2048, Bs, S5) == "asm"
    st0 = jax.vmap(lambda _: init_state(t2, cfg_s))(jnp.arange(S5))
    mb = jnp.asarray(rng.standard_normal((K5, S5, Bs)).astype(np.float32))
    maz = jnp.asarray((np.linspace(0, 350, K5 * S5).reshape(K5, S5))
                      .astype(np.float32))
    mel = jnp.zeros((K5, S5), jnp.float32)

    def burst(cfg_b):
        _, ys = jax.jit(_batch_scan_core, static_argnames="config")(
            t2, st0, mb, maz, mel, config=cfg_b)
        return ys

    out["stream_asm_db"] = _snr(burst(cfg_sx), burst(cfg_s))
    cfg_k4 = RenderConfig(stream_block=Bs, stream_update_rate=4)
    cfg_k4x = cfg_k4.replace(use_pallas=False)
    out["stream_hold_db"] = _snr(burst(cfg_k4x), burst(cfg_k4))

    out["snr_db"] = min(v for k, v in out.items() if k.endswith("_db"))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
