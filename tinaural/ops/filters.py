"""Effective-filter assembly (components C5 + C6 — SURVEY.md §2) in JAX.

Mirrors `tinaural.reference.golden.effective_filter` bit-for-bit in f32:
materialise `gain · fractional_delay(aligned shape)` as one fixed-length
FIR per direction, which every render mode then convolves verbatim (the
parity-critical design decision documented in the golden module). The
fractional-delay ITD (BASELINE.json:8) is the integer-exact +
tapered-sub-sample phase ramp of `tinaural.data.table.delay_ramp`; the ILD
is the scalar per-ear gain fused into the same spectral multiply.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..data.table import ALIGN_GUARD, TAPER_HI, TAPER_LO

# Must match tinaural.reference.golden.DELAY_PAD.
DELAY_PAD = 64


def next_pow2(n: int) -> int:
    m = 1
    while m < n:
        m *= 2
    return m


def delay_ramp(n_fft: int, shift_samples: jax.Array) -> jax.Array:
    """JAX mirror of `tinaural.data.table.delay_ramp` (see its docstring
    for the integer/fractional split + taper rationale).

    shift_samples: (...) → (..., n_fft//2 + 1) complex64, |ramp| = 1.
    """
    d = shift_samples[..., None].astype(jnp.float32)
    di = jnp.round(d)
    df = d - di
    fnorm = (jnp.arange(n_fft // 2 + 1, dtype=jnp.float32) / n_fft)
    t = jnp.clip((fnorm - TAPER_LO) / (TAPER_HI - TAPER_LO), 0.0, 1.0)
    taper = 0.5 * (1.0 + jnp.cos(jnp.pi * t))
    phase = -2.0 * jnp.pi * fnorm * (di + taper * df)
    return jax.lax.complex(jnp.cos(phase), jnp.sin(phase))


def _clip_delay(d: jax.Array) -> jax.Array:
    return jnp.clip(d - ALIGN_GUARD, -ALIGN_GUARD, DELAY_PAD - 16.0)


@lru_cache(maxsize=8)
def _assembly_basis(taps: int) -> tuple[np.ndarray, np.ndarray]:
    """Shared pieces of every precomposed assembly map: M1 (taps → [Re G,
    Im G] rfft_L planes) and the time-domain images of the 2·F_L re/im
    basis vectors after irfft_L + truncate-to-T_pad (each downstream map
    composes its own final stage on top of these)."""
    T_pad = taps + DELAY_PAD
    L = next_pow2(T_pad)
    FL = L // 2 + 1
    G = np.fft.rfft(np.eye(taps), n=L, axis=-1)  # (taps, FL)
    M1 = np.concatenate([G.real, G.imag], axis=-1)
    basis = np.zeros((2 * FL, FL), dtype=np.complex128)
    basis[:FL] = np.eye(FL)
    basis[FL:] = 1j * np.eye(FL)
    ht = np.fft.irfft(basis, n=L, axis=-1)[:, :T_pad]  # (2FL, T_pad)
    return M1.astype(np.float64), ht


@lru_cache(maxsize=8)
def _zoom_matrices(taps: int, n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Precompose the filter-assembly chain into two real matrices (MXU).

    The per-block chain `h → rfft_L → (·ramp·gain) → irfft_L → trunc_Tpad
    → rfft_nfft` spends ~60% of the trajectory render's per-block time in
    its FFT stages (measured: static scenes that skip it run ~2.5× faster
    per block). Everything around the direction-dependent diagonal
    (ramp·gain) is a *fixed linear map*, so it is precomposed here into:

      M1: (taps, 2·F_L)   —  h ↦ [Re G, Im G],  G = rfft_L(h)
      M2: (2·F_L, 2·F_n)  —  [Re G', Im G'] ↦ [Re H, Im H],
                              H = rfft_nfft(trunc_Tpad(irfft_L(G')))

    Both maps are only R-linear (irfft conjugates the upper bins), so they
    act on stacked re/im planes. Columns are built by pushing basis
    vectors through the NumPy reference chain — the matrices are the
    oracle's own operators, exactly, including the truncation; the only
    numerical difference from the FFT path is f32 matmul accumulation
    (~1e-6 relative). Cached per (taps, n_fft); ~2 MB for n_fft=2048.
    """
    Fn = n_fft // 2 + 1
    M1, ht = _assembly_basis(taps)
    H = np.fft.rfft(ht, n=n_fft, axis=-1)  # (2FL, Fn)
    M2 = np.concatenate([H.real, H.imag], axis=-1)  # (2FL, 2Fn)
    return M1.astype(np.float32), M2.astype(np.float32)


def filter_spectrum_mm(h: jax.Array, d: jax.Array, g: jax.Array,
                       taps: int, n_fft: int) -> jax.Array:
    """Effective-filter spectrum at ``n_fft`` via the MXU zoom matmuls.

    h: (..., 2, taps); d, g: (..., 2) → (..., 2, n_fft//2+1) complex64.
    Same semantics as `rfft(effective_filter(...), n_fft)` (see
    `_zoom_matrices`); used by the block renderers where n_fft is small.
    """
    L = next_pow2(taps + DELAY_PAD)
    FL = L // 2 + 1
    Fn = n_fft // 2 + 1
    m1, m2 = _zoom_matrices(taps, n_fft)
    M1, M2 = jnp.asarray(m1), jnp.asarray(m2)

    # Precision.HIGHEST: TPU matmuls default to bf16 multiplies, which
    # was measured to cap parity at ~53 dB — below the 60 dB gate. The
    # f32 (3-pass) mode keeps parity >100 dB at negligible cost here.
    G = jnp.matmul(h, M1, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)  # (..., 2FL)
    Gr, Gi = G[..., :FL], G[..., FL:]
    ramp = delay_ramp(L, _clip_delay(d))  # (..., 2, FL) complex
    c, s = ramp.real, ramp.imag
    gg = g[..., None]
    G2 = jnp.concatenate([(Gr * c - Gi * s) * gg, (Gr * s + Gi * c) * gg],
                         axis=-1)
    H = jnp.matmul(G2, M2, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)  # (..., 2Fn)
    return jax.lax.complex(H[..., :Fn], H[..., Fn:])


@lru_cache(maxsize=8)
def _hybrid_matrices(taps: int) -> tuple[np.ndarray, np.ndarray]:
    """M1 (taps → 2F_L re/im spectra) and MB (2F_L → T_pad time domain:
    irfft_L + truncate composed). Stage profiling showed the *small* FFTs
    (the L=256 roundtrip) dominate the assembly cost on this backend while
    large batched FFTs are cheap — so the hybrid path does the small maps
    as matmuls and leaves the final rfft_nfft to XLA. The full-zoom M2 of
    `_zoom_matrices` also wastes rank: it factors through the T_pad-sample
    time domain (rank ≤ T_pad), which is exactly what MB exposes."""
    M1, ht = _assembly_basis(taps)
    return M1.astype(np.float32), ht.astype(np.float32)


def filter_spectrum_hybrid(h: jax.Array, d: jax.Array, g: jax.Array,
                           taps: int, n_fft: int) -> jax.Array:
    """Effective-filter spectrum via small MXU matmuls + one batched rfft.

    Same linear map as `filter_spectrum_mm` / the FFT chain (matrices are
    pushed through the NumPy oracle); fastest variant measured on TPU.
    h: (..., 2, taps); d, g: (..., 2) → (..., 2, n_fft//2+1) complex64.
    """
    L = next_pow2(taps + DELAY_PAD)
    FL = L // 2 + 1
    m1, mb = _hybrid_matrices(taps)
    M1, MB = jnp.asarray(m1), jnp.asarray(mb)

    G = jnp.matmul(h, M1, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    Gr, Gi = G[..., :FL], G[..., FL:]
    ramp = delay_ramp(L, _clip_delay(d))
    c, s = ramp.real, ramp.imag
    gg = g[..., None]
    G2 = jnp.concatenate([(Gr * c - Gi * s) * gg, (Gr * s + Gi * c) * gg],
                         axis=-1)
    h_eff = jnp.matmul(G2, MB, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)  # (..., 2, T_pad)
    return jnp.fft.rfft(h_eff, n=n_fft)


@lru_cache(maxsize=8)
def _partition_zoom_matrices(taps: int, block: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Like `_zoom_matrices`, but the output map lands directly on the
    streaming renderer's partition spectra: G' ↦ rfft_2B of each hop-sized
    chunk of trunc(irfft_L(G')) (see golden.partition_filter). Returns
    (M1, M2p, P) with M2p: (2·F_L, P·2·(B+1))."""
    T_pad = taps + DELAY_PAD
    L = next_pow2(T_pad)
    FL = L // 2 + 1
    P = -(-T_pad // block)
    F2 = block + 1

    M1, ht = _assembly_basis(taps)
    parts = np.zeros((2 * FL, P, block))
    for p in range(P):
        seg = ht[:, p * block : (p + 1) * block]
        parts[:, p, : seg.shape[-1]] = seg
    Hp = np.fft.rfft(parts, n=2 * block, axis=-1)  # (2FL, P, F2)
    M2 = np.concatenate([Hp.real, Hp.imag], axis=-1)  # (2FL, P, 2F2)
    return (M1.astype(np.float32),
            M2.reshape(2 * FL, P * 2 * F2).astype(np.float32), P)


def ramped_spectrum_planes(h: jax.Array, d: jax.Array, g: jax.Array,
                           taps: int) -> jax.Array:
    """The direction-dependent half of every assembly map: rfft_L planes
    of the gathered shapes with the delay ramp + gain applied.
    h: (..., 2, taps); d, g: (..., 2) → (..., 2, 2·F_L) [Re | Im]."""
    L = next_pow2(taps + DELAY_PAD)
    FL = L // 2 + 1
    M1 = jnp.asarray(_assembly_basis(taps)[0].astype(np.float32))
    G = jnp.matmul(h, M1, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    Gr, Gi = G[..., :FL], G[..., FL:]
    ramp = delay_ramp(L, _clip_delay(d))
    c, s = ramp.real, ramp.imag
    gg = g[..., None]
    return jnp.concatenate([(Gr * c - Gi * s) * gg, (Gr * s + Gi * c) * gg],
                           axis=-1)


def filter_partitions_mm(h: jax.Array, d: jax.Array, g: jax.Array,
                         taps: int, block: int) -> jax.Array:
    """Streaming partition spectra via the zoom matmuls.

    h: (2, taps); d, g: (2,) → (P, 2, block+1) complex64 — same map as
    golden.partition_filter(effective_filter(...)), per-block cost two
    small MXU matmuls instead of three FFT stages.
    """
    F2 = block + 1
    m1, m2, P = _partition_zoom_matrices(taps, block)
    M2 = jnp.asarray(m2)
    G2 = ramped_spectrum_planes(h, d, g, taps)  # (2, 2FL)
    Hm = jnp.matmul(G2, M2, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # (2, P·2F2)
    Hm = Hm.reshape(2, P, 2 * F2)
    return jax.lax.complex(Hm[..., :F2], Hm[..., F2:]).transpose(1, 0, 2)


def filter_partitions(h: jax.Array, d: jax.Array, g: jax.Array,
                      taps: int, block: int, use_matmul: bool) -> jax.Array:
    """Streaming/partitioned-conv filter spectra with the path selected by
    ``use_matmul`` (config.filter_path != "fft") — one definition shared by
    Stream and the batched partitioned renderer so the two stay
    bit-identical under any config. → (P, 2, block+1) complex64."""
    if use_matmul:
        return filter_partitions_mm(h, d, g, taps, block)
    T_pad = taps + DELAY_PAD
    P = -(-T_pad // block)
    h_eff = effective_filter(h, d, g, taps)  # (2, T_eff)
    parts = jnp.zeros((2, P * block), dtype=h_eff.dtype)
    parts = parts.at[:, : h_eff.shape[-1]].set(h_eff).reshape(2, P, block)
    return jnp.fft.rfft(parts, n=2 * block, axis=-1).transpose(1, 0, 2)


def effective_filter(h: jax.Array, d: jax.Array, g: jax.Array,
                     taps: int) -> jax.Array:
    """Materialise the per-direction FIR.

    h: (..., 2, T) aligned shapes; d, g: (..., 2) → (..., 2, T+DELAY_PAD).
    Batched over leading axes (blocks, sources) — the rfft/irfft pair runs
    as one batched XLA FFT.
    """
    T_pad = taps + DELAY_PAD
    L = next_pow2(T_pad)
    d = jnp.clip(d - ALIGN_GUARD, -ALIGN_GUARD, DELAY_PAD - 16.0)
    H = jnp.fft.rfft(h, n=L) * delay_ramp(L, d) * g[..., None]
    return jnp.fft.irfft(H, n=L)[..., :T_pad].astype(h.dtype)
