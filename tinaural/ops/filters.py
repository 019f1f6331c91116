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

import jax
import jax.numpy as jnp

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
