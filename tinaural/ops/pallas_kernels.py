"""Pallas TPU kernels (rebuild-only component — SURVEY.md §2 last rows;
BASELINE.json:5 "fused Pallas rfft→complex-multiply→irfft overlap-add
kernel").

Per SURVEY.md §7 hard-part 1, the plan of record keeps rfft/irfft as XLA
library ops (Pallas/Mosaic has no FFT primitive) and fuses the
memory-bound middle: the crossfaded complex multiply-accumulate
``Y[b,e,f] = Xu[b,f]·Hc[b,e,f] + Xd[b,f]·Hp[b,e,f]`` runs as ONE VMEM
kernel over all blocks and ears, instead of XLA's chain of
broadcast/multiply/add fusions. Complex data travels as separate
real/imag f32 planes — Mosaic has no native complex dtype, and split
planes keep the (8,128) f32 tiling exact.

The jnp path remains the permanent default (`RenderConfig.use_pallas`
gates this kernel; SURVEY.md §7 M6); parity tests run the kernel in
interpreter mode on CPU and the benchmark exercises it compiled on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


# Blocks processed per grid step: keeps the sublane dimension at the f32
# tile minimum (8) required by Mosaic.
_ROWS = 8


def _cmul_acc_kernel(xu_re, xu_im, xd_re, xd_im,
                     hc_re, hc_im, hp_re, hp_im,
                     y_re, y_im):
    """One grid step = _ROWS blocks: Y[e] = Xu·Hc[e] + Xd·Hp[e], complex.

    X refs are (_ROWS, Fp); H/Y refs are (_ROWS, 2·Fp) with the two ears
    laid out side by side along lanes (Fp is 128-aligned, so each ear's
    half is a lane-aligned static slice).
    """
    Fp = xu_re.shape[-1]
    ur, ui = xu_re[...], xu_im[...]  # (_ROWS, Fp)
    dr, di = xd_re[...], xd_im[...]
    for half in range(2):  # static unroll over ears
        s = slice(half * Fp, (half + 1) * Fp)
        cr, ci = hc_re[:, s], hc_im[:, s]
        pr, pi = hp_re[:, s], hp_im[:, s]
        # (a+bi)(c+di) = (ac − bd) + (ad + bc)i
        y_re[:, s] = ur * cr - ui * ci + dr * pr - di * pi
        y_im[:, s] = ur * ci + ui * cr + dr * pi + di * pr


@partial(jax.jit, static_argnames=("interpret",))
def fused_spectral_mac(Xu: jax.Array, Xd: jax.Array, Hc: jax.Array,
                       Hp: jax.Array, interpret: bool = False) -> jax.Array:
    """Crossfaded spectral multiply-accumulate for the block renderer.

    Xu, Xd: (nb, F) complex64 — up/down-ramped input block spectra.
    Hc, Hp: (nb, 2, F) complex64 — current/previous block filter spectra.
    → (nb, 2, F) complex64.
    """
    nb, F = Xu.shape
    Fp = _round_up(F, 128)
    nbp = _round_up(nb, _ROWS)

    def planes(z):
        if z.ndim == 3:  # (nb, 2, F) → (nbp, 2·Fp), ears side by side
            z = jnp.pad(z, [(0, nbp - nb), (0, 0), (0, Fp - F)])
            z = z.reshape(nbp, 2 * Fp)
        else:  # (nb, F) → (nbp, Fp)
            z = jnp.pad(z, [(0, nbp - nb), (0, Fp - F)])
        return z.real.astype(jnp.float32), z.imag.astype(jnp.float32)

    xur, xui = planes(Xu)
    xdr, xdi = planes(Xd)
    hcr, hci = planes(Hc)
    hpr, hpi = planes(Hp)

    vec = pl.BlockSpec((_ROWS, Fp), lambda b: (b, 0), memory_space=pltpu.VMEM)
    ear = pl.BlockSpec((_ROWS, 2 * Fp), lambda b: (b, 0), memory_space=pltpu.VMEM)

    y_re, y_im = pl.pallas_call(
        _cmul_acc_kernel,
        grid=(nbp // _ROWS,),
        in_specs=[vec, vec, vec, vec, ear, ear, ear, ear],
        out_specs=(ear, ear),
        out_shape=(
            jax.ShapeDtypeStruct((nbp, 2 * Fp), jnp.float32),
            jax.ShapeDtypeStruct((nbp, 2 * Fp), jnp.float32),
        ),
        interpret=interpret,
    )(xur, xui, xdr, xdi, hcr, hci, hpr, hpi)
    Y = jax.lax.complex(y_re, y_im).reshape(nbp, 2, Fp)
    return Y[:nb, :, :F]
