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

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..data.table import ALIGN_GUARD, TAPER_HI, TAPER_LO


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


# ===================== fused filter-assembly + MAC kernel ====================
#
# Round-1 profiling showed the per-block filter assembly (the zoom-matmul
# chain of tinaural.ops.filters.filter_spectrum_mm) dominating the moving-
# render headline at ~2 TFLOP/s — fusion/bandwidth-bound, not FLOP-bound:
# XLA materialises every stage (ramped planes, h_eff, the (nb, 2, F_n)
# filter spectra ≈ 34 MB, plus a shifted copy for the crossfade) in HBM.
# This kernel runs the WHOLE chain for a chunk of blocks in VMEM:
#
#   h ─M1→ rfft_L planes ─ramp·gain diag (VPU trig)→ G2 ─MB→ h_eff ─MA→ H
#     └──────────────── MXU, constants VMEM-resident ────────────────┘
#   Y = Xu·Hc + Xd·Hp   (crossfaded MAC; Hp = previous block's H, carried
#                        across grid steps in a VMEM scratch — filter
#                        spectra NEVER touch HBM)
#
# Rows are laid out [ear0 × CHUNK blocks; ear1 × CHUNK blocks] so the two
# ears (independent delay/gain diagonals) ride the same matmuls while the
# block-only input spectra apply to each ear by static slicing. A per-block
# `first` mask (1.0 where a block starts a new source/trajectory) selects
# Hp = Hc there, which both implements the b=0 crossfade convention and
# makes the carry safe across flattened multi-source batches — no
# program_id dependence.
#
# The matrices are the exact oracle-derived zoom matrices of
# tinaural.ops.filters (padded with zeros to lane multiples), and the ramp
# trig mirrors tinaural.ops.filters.delay_ramp, so the kernel computes the
# same linear map as the XLA path (parity-tested in interpret mode and by
# the on-chip TINAURAL_PERF gate).

def _ramp_trig_table(L: int, FLp: int) -> np.ndarray:
    """Lane-constant delay-ramp factors, rows [θ, sin θ, cos θ, taper w]
    over the L-point rfft bins, padded to FLp lanes. Shared by both fused
    kernels' constant builders."""
    fnorm = np.arange(FLp) / L
    theta = -2.0 * np.pi * fnorm
    t = np.clip((fnorm - TAPER_LO) / (TAPER_HI - TAPER_LO), 0.0, 1.0)
    trig = np.zeros((8, FLp), np.float32)
    trig[0] = theta
    trig[1] = np.sin(theta)
    trig[2] = np.cos(theta)
    trig[3] = 0.5 * (1.0 + np.cos(np.pi * t))
    return trig


def _ramp_cos_sin(d, trig_ref):
    """In-kernel delay ramp (mirror of ops.filters.delay_ramp incl. the
    clip): d (R, 1) delays + the _ramp_trig_table constant → (cos, sin)
    of the ramp phase, (R, FLp) each. The lane-only factors come from the
    table (the XLA chain recomputed them per (block, ear); profiled at
    40% of assembly cost); only atan2/cos/sin of the d-dependent phase
    remain per element."""
    from .filters import DELAY_PAD

    theta = trig_ref[0:1, :]
    sin_t = trig_ref[1:2, :]
    cos_t = trig_ref[2:3, :]
    w = trig_ref[3:4, :]
    dc = jnp.clip(d - ALIGN_GUARD, -ALIGN_GUARD, DELAY_PAD - 16.0)
    di = jnp.floor(dc)
    frac = dc - di
    psi = _atan2(frac * sin_t, (1.0 - frac) + frac * cos_t)
    phase = theta * di + (w * theta) * frac + (1.0 - w) * psi
    return jnp.cos(phase), jnp.sin(phase)


# Blocks per grid step of the assembly kernel → 2× this many (block, ear)
# rows per matmul. 64 measured ≈ 128 on v5e (interleaved A/B) and leaves
# more VMEM headroom for longer filters, so 64 is the default.
_DEFAULT_CHUNK = 64


def _atan2(y: jax.Array, x: jax.Array) -> jax.Array:
    """Branch-free f32 atan2 for Mosaic (no atan2 lowering exists).

    Cephes atanf reduction: fold into [0, 1] by octant swap, then the
    |t| ≤ tan(π/8) polynomial after the (t−1)/(t+1) half-angle step —
    ~1-ulp f32 accuracy, matching XLA's own polynomial to float noise.
    """
    ax, ay = jnp.abs(x), jnp.abs(y)
    swap = ay > ax
    num = jnp.where(swap, ax, ay)
    den = jnp.maximum(jnp.where(swap, ay, ax), 1e-30)
    r = num / den  # [0, 1]
    mid = r > 0.4142135623730951  # tan(π/8)
    t = jnp.where(mid, (r - 1.0) / (r + 1.0), r)
    base = jnp.where(mid, jnp.float32(np.pi / 4), jnp.float32(0.0))
    z2 = t * t
    poly = (((8.05374449538e-2 * z2 - 1.38776856032e-1) * z2
             + 1.99777106478e-1) * z2 - 3.33329491539e-1)
    z = base + t + t * z2 * poly
    z = jnp.where(swap, jnp.float32(np.pi / 2) - z, z)
    z = jnp.where(x < 0.0, jnp.float32(np.pi) - z, z)
    return jnp.where(y < 0.0, -z, z)


@lru_cache(maxsize=8)
def _padded_assembly_mats(taps: int, n_fft: int):
    """Zoom matrices padded to TPU lane multiples.

    Returns (M1p (taps_p, 2·FLp), MBp (2·FLp, Tp_p), MAp (Tp_p, 2·Fnp),
    dims) with dims = (L, FL, FLp, T_pad, Tp_p, Fn, Fnp, taps_p). Columns
    [FLp:FLp+FL) hold the imaginary planes so each plane is lane-aligned.
    """
    from .filters import DELAY_PAD, _hybrid_matrices, _rfft_matrix, next_pow2

    T_pad = taps + DELAY_PAD
    L = next_pow2(T_pad)
    FL = L // 2 + 1
    Fn = n_fft // 2 + 1
    FLp = _round_up(FL, 128)
    Tp_p = _round_up(T_pad, 128)
    Fnp = _round_up(Fn, 128)
    taps_p = _round_up(taps, 128)

    M1, MB = _hybrid_matrices(taps)      # (taps, 2FL), (2FL, T_pad)
    MA = _rfft_matrix(taps, n_fft)        # (T_pad, 2Fn)

    M1p = np.zeros((taps_p, 2 * FLp), np.float32)
    M1p[:taps, :FL] = M1[:, :FL]
    M1p[:taps, FLp:FLp + FL] = M1[:, FL:]

    MBp = np.zeros((2 * FLp, Tp_p), np.float32)
    MBp[:FL, :T_pad] = MB[:FL]
    MBp[FLp:FLp + FL, :T_pad] = MB[FL:]

    MAp = np.zeros((Tp_p, 2 * Fnp), np.float32)
    MAp[:T_pad, :Fn] = MA[:, :Fn]
    MAp[:T_pad, Fnp:Fnp + Fn] = MA[:, Fn:]

    # Lanes ≥ FL are don't-cares — M1p's zero columns null their
    # contribution through the chain.
    trig = _ramp_trig_table(L, FLp)

    dims = (L, FL, FLp, T_pad, Tp_p, Fn, Fnp, taps_p)
    return M1p, MBp, MAp, trig, dims


def _assembly_mac_kernel(crossfade: bool, FLp: int, Fn: int, Fnp: int,
                         precision, chunk: int,
                         h_ref, d_ref, g_ref, first_ref,
                         xu_re, xu_im, xd_re, xd_im,
                         m1_ref, mb_ref, ma_ref, trig_ref,
                         y_re, y_im, carry):
    """One grid step: assemble 2*chunk filter rows and MAC them against
    the chunk's input spectra. All refs are 2-D (rows laid out
    [ear0 x chunk; ear1 x chunk] by the wrapper) — 3-D blocks plus
    in-kernel reshapes measured as pure overhead on Mosaic."""
    _CHUNK = chunk
    h = h_ref[...]          # (R, taps_p)
    d = d_ref[...]          # (R, 1)
    g = g_ref[...]

    G = jnp.dot(h, m1_ref[...], preferred_element_type=jnp.float32,
                precision=precision)  # (R, 2FLp)

    c, s = _ramp_cos_sin(d, trig_ref)

    Gr = G[:, :FLp]
    Gi = G[:, FLp:]
    G2 = jnp.concatenate([(Gr * c - Gi * s) * g, (Gr * s + Gi * c) * g],
                         axis=1)  # (R, 2FLp)
    h_eff = jnp.dot(G2, mb_ref[...], preferred_element_type=jnp.float32,
                    precision=precision)  # (R, Tp_p)
    H = jnp.dot(h_eff, ma_ref[...], preferred_element_type=jnp.float32,
                precision=precision)  # (R, 2Fnp)

    Hc0 = H[:_CHUNK]
    Hc1 = H[_CHUNK:]
    ur, ui = xu_re[...], xu_im[...]  # (_CHUNK, Fn)

    if crossfade:
        fm = first_ref[...]  # (_CHUNK, 1)
        prev0 = jnp.concatenate([carry[0:1], Hc0[:-1]], axis=0)
        prev1 = jnp.concatenate([carry[1:2], Hc1[:-1]], axis=0)
        Hp0 = jnp.where(fm > 0.5, Hc0, prev0)
        Hp1 = jnp.where(fm > 0.5, Hc1, prev1)
        carry[0:1] = Hc0[-1:]
        carry[1:2] = Hc1[-1:]
        dr, dim = xd_re[...], xd_im[...]
        for ear, (Hce, Hpe) in enumerate(((Hc0, Hp0), (Hc1, Hp1))):
            hcr, hci = Hce[:, :Fn], Hce[:, Fnp:Fnp + Fn]
            hpr, hpi = Hpe[:, :Fn], Hpe[:, Fnp:Fnp + Fn]
            rows = slice(ear * _CHUNK, (ear + 1) * _CHUNK)
            y_re[rows, :] = ur * hcr - ui * hci + dr * hpr - dim * hpi
            y_im[rows, :] = ur * hci + ui * hcr + dr * hpi + dim * hpr
    else:
        for ear, Hce in enumerate((Hc0, Hc1)):
            hcr, hci = Hce[:, :Fn], Hce[:, Fnp:Fnp + Fn]
            rows = slice(ear * _CHUNK, (ear + 1) * _CHUNK)
            y_re[rows, :] = ur * hcr - ui * hci
            y_im[rows, :] = ur * hci + ui * hcr


def assembly_mac_vmem_bytes(taps: int, n_fft: int) -> int:
    """Rough VMEM footprint of the fused kernel's resident constants +
    working set, used to gate kernel eligibility (long BRIRs overflow)."""
    _, _, _, _, (L, FL, FLp, T_pad, Tp_p, Fn, Fnp, taps_p) = \
        _padded_assembly_mats(taps, n_fft)
    consts = (taps_p * 2 * FLp + 2 * FLp * Tp_p + Tp_p * 2 * Fnp) * 4
    work = 2 * _DEFAULT_CHUNK * (taps_p + 4 * FLp + Tp_p + 4 * Fnp + 2 * Fnp) * 4
    return consts + work + 8 * 2 * Fnp * 4


@partial(jax.jit,
         static_argnames=("taps", "n_fft", "crossfade", "interpret",
                          "precision", "chunk"))
def fused_assembly_mac(h: jax.Array, d: jax.Array, g: jax.Array,
                       Xu: jax.Array, Xd: jax.Array, first: jax.Array,
                       taps: int, n_fft: int, crossfade: bool = True,
                       interpret: bool = False,
                       precision=jax.lax.Precision.HIGHEST,
                       chunk: int | None = None) -> jax.Array:
    """Filter assembly + crossfaded spectral MAC in one Pallas launch.

    h: (nb, 2, taps) gathered aligned shapes; d, g: (nb, 2) delays/gains;
    Xu, Xd: (nb, F) complex64 up/down-ramped input block spectra (Xd
    ignored when not crossfading); first: (nb,) f32, 1.0 where a block
    starts a new trajectory (its "previous" filter is itself).
    -> Y (nb, 2, F) complex64 == Xu*Hc + Xd*Hprev with
    Hc = filter_spectrum_mm(h, d, g) — same map, no HBM filter tensors.
    """
    nb = h.shape[0]
    # The kernel reads the VMEM carry scratch before any write on grid
    # step 0; block 0 has no predecessor by construction, so force its
    # first-flag rather than trusting every caller (round-2 advisor
    # finding: a caller passing first[0]=0 would read uninitialized VMEM).
    first = first.at[0].set(1.0)
    _CHUNK = chunk if chunk is not None else _DEFAULT_CHUNK
    M1p, MBp, MAp, trig, dims = _padded_assembly_mats(taps, n_fft)
    L, FL, FLp, T_pad, Tp_p, Fn, Fnp, taps_p = dims

    nbp = _round_up(max(nb, 1), _CHUNK)
    pb = nbp - nb
    nch = nbp // _CHUNK
    R = 2 * _CHUNK

    def rows(z, lanes):  # (nb, 2, lanes-ish) -> chunk-major (2*nbp, lanes)
        z = jnp.pad(z, [(0, pb)] + [(0, 0)] * (z.ndim - 1))
        z = z.reshape(nch, _CHUNK, 2, -1).transpose(0, 2, 1, 3)
        return z.reshape(2 * nbp, lanes)

    hR = rows(jnp.pad(h, [(0, 0), (0, 0), (0, taps_p - taps)]), taps_p)
    dR = rows(d[..., None], 1)
    gR = rows(g[..., None], 1)
    fm = jnp.pad(first.astype(jnp.float32), [(0, pb)],
                 constant_values=1.0)[..., None]  # (nbp, 1)
    # X/Y lane dims stay UNPADDED (Mosaic masks the ragged tail in VMEM);
    # padding them in XLA was a measured ~30 MB of pure copy per call.
    xur = jnp.pad(jnp.real(Xu), [(0, pb), (0, 0)])
    xui = jnp.pad(jnp.imag(Xu), [(0, pb), (0, 0)])
    if crossfade:
        xdr = jnp.pad(jnp.real(Xd), [(0, pb), (0, 0)])
        xdi = jnp.pad(jnp.imag(Xd), [(0, pb), (0, 0)])
    else:
        xdr, xdi = xur, xui

    grid = (nch,)
    vec = pl.BlockSpec((_CHUNK, Fn), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    col = lambda r: pl.BlockSpec((r, 1), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    rowblk = lambda n: pl.BlockSpec((R, n), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)

    y_re, y_im = pl.pallas_call(
        partial(_assembly_mac_kernel, crossfade, FLp, Fn, Fnp, precision,
                _CHUNK),
        grid=grid,
        in_specs=[rowblk(taps_p), col(R), col(R), col(_CHUNK),
                  vec, vec, vec, vec,
                  const(M1p), const(MBp), const(MAp), const(trig)],
        out_specs=(rowblk(Fn), rowblk(Fn)),
        out_shape=(jax.ShapeDtypeStruct((2 * nbp, Fn), jnp.float32),
                   jax.ShapeDtypeStruct((2 * nbp, Fn), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((8, 2 * Fnp), jnp.float32)],
        interpret=interpret,
    )(hR, dR, gR, fm, xur, xui, xdr, xdi,
      jnp.asarray(M1p), jnp.asarray(MBp), jnp.asarray(MAp),
      jnp.asarray(trig))

    Y = jax.lax.complex(y_re, y_im)  # (2*nbp, Fn) chunk-major
    Y = Y.reshape(nch, 2, _CHUNK, Fn).transpose(0, 2, 1, 3)
    return Y.reshape(nbp, 2, Fn)[:nb]

# ======================== fused streaming-step kernel ========================
#
# One Pallas launch per Stream.push / BatchedStream.push (ROADMAP #4): the
# XLA step is ~15 small ops (rfft, FDL shift, partition assembly, einsum
# MAC, irfft, crossfade) over tiny tensors — dispatch/fusion-bound rather
# than compute-bound at real-time block sizes. Here the whole step runs in
# VMEM as matmuls + elementwise:
#
#   frame ─DFTr→ X ─shift→ FDL                        (rfft as MXU matmul)
#   h ─M1→ planes ─ramp·gain→ G2 ─M2p→ H partitions   (assembly, exactly as
#                                                      in the block kernel)
#   Yn/Yp = Σ_p FDL[p]·H[p] / ·Hprev[p]               (VPU, crossfade pair)
#   [Yn; Yp] ─DI→ last-B samples ─blend→ out          (irfft tail as MXU
#                                                      matmul: only the B
#                                                      output samples are
#                                                      ever computed)
#
# Rows are streams (ears stacked [e0; e1] for the assembly/H rows), so
# BatchedStream's S streams ride one launch with no vmap. The DFT/iDFT
# matrices are generated by pushing basis vectors through the NumPy
# transforms — the same exactness story as the zoom matrices.


@lru_cache(maxsize=8)
def _stream_step_mats(taps: int, block: int):
    """Constants for the fused streaming step.

    Returns (M1p, M2p, trig, DFTr, DI, dims), dims = (L, FL, FLp, F2,
    F2p, P, taps_p). Plane layout [Re | Im] at lane-aligned offsets;
    M2p groups partition p's planes in lanes [p·2F2p, (p+1)·2F2p).
    """
    from .filters import _partition_zoom_matrices, next_pow2

    F2 = block + 1
    F2p = _round_up(F2, 128)
    taps_p = _round_up(taps, 128)

    m1, m2, P = _partition_zoom_matrices(taps, block)  # (taps,2FL),(2FL,P·2F2)
    FL = (m1.shape[1]) // 2
    L = (FL - 1) * 2
    FLp = _round_up(FL, 128)

    M1p = np.zeros((taps_p, 2 * FLp), np.float32)
    M1p[:taps, :FL] = m1[:, :FL]
    M1p[:taps, FLp:FLp + FL] = m1[:, FL:]

    m2 = m2.reshape(2 * FL, P, 2 * F2)
    M2p = np.zeros((2 * FLp, P * 2 * F2p), np.float32)
    for p in range(P):
        base = p * 2 * F2p
        M2p[:FL, base:base + F2] = m2[:FL, p, :F2]
        M2p[:FL, base + F2p:base + F2p + F2] = m2[:FL, p, F2:]
        M2p[FLp:FLp + FL, base:base + F2] = m2[FL:, p, :F2]
        M2p[FLp:FLp + FL, base + F2p:base + F2p + F2] = m2[FL:, p, F2:]

    trig = _ramp_trig_table(L, FLp)

    # rfft of the 2B overlap-save frame as a real matmul → [Re|Im] planes
    G = np.fft.rfft(np.eye(2 * block), axis=-1)  # (2B, F2)
    DFTr = np.zeros((2 * block, 2 * F2p), np.float32)
    DFTr[:, :F2] = G.real
    DFTr[:, F2p:F2p + F2] = G.imag

    # last-B samples of irfft_2B from [Re|Im] planes (overlap-save tail)
    basis = np.zeros((2 * F2p, F2), np.complex128)
    basis[:F2] = np.eye(F2)
    basis[F2p:F2p + F2] = 1j * np.eye(F2)
    DI = np.fft.irfft(basis, n=2 * block, axis=-1)[:, block:].astype(np.float32)

    dims = (L, FL, FLp, F2, F2p, P, taps_p)
    return M1p, M2p, trig, DFTr, DI, dims


def _stream_step_kernel(crossfade: bool, Sp: int, B: int, FLp: int,
                        F2p: int, P: int, precision,
                        prev_in, xb_ref, fdl_re, fdl_im, ph_ref, started_ref,
                        h_ref, d_ref, g_ref,
                        m1_ref, m2_ref, trig_ref, dft_ref, di_ref,
                        y_out, nf_re, nf_im, nh_out):
    """One grid step = Sp streams (2·Sp filter rows laid out
    [ear0 streams; ear1 streams]); streams are independent, so the grid
    carries no cross-step state and batch size is unbounded."""
    hp = precision

    frame = jnp.concatenate([prev_in[...], xb_ref[...]], axis=1)  # (Sp, 2B)
    X = jnp.dot(frame, dft_ref[...], preferred_element_type=jnp.float32,
                precision=hp)  # (Sp, 2F2p)
    xre, xim = X[:, :F2p], X[:, F2p:]

    if P > 1:
        fr = jnp.concatenate([xre, fdl_re[...][:, :(P - 1) * F2p]], axis=1)
        fi = jnp.concatenate([xim, fdl_im[...][:, :(P - 1) * F2p]], axis=1)
    else:
        fr, fi = xre, xim
    nf_re[...] = fr
    nf_im[...] = fi

    G = jnp.dot(h_ref[...], m1_ref[...], preferred_element_type=jnp.float32,
                precision=hp)  # (2Sp, 2FLp)
    c, s = _ramp_cos_sin(d_ref[...], trig_ref)
    g = g_ref[...]
    Gr, Gi = G[:, :FLp], G[:, FLp:]
    G2 = jnp.concatenate([(Gr * c - Gi * s) * g, (Gr * s + Gi * c) * g],
                         axis=1)
    H = jnp.dot(G2, m2_ref[...], preferred_element_type=jnp.float32,
                precision=hp)  # (2Sp, P·2F2p)
    nh_out[...] = H

    fr2 = jnp.concatenate([fr, fr], axis=0)  # FDL copied per ear row group
    fi2 = jnp.concatenate([fi, fi], axis=0)

    def mac(Hrows):  # (2Sp, P·2F2p) → (2Sp, F2p) re/im
        yr = jnp.zeros((2 * Sp, F2p), jnp.float32)
        yi = jnp.zeros((2 * Sp, F2p), jnp.float32)
        for p in range(P):
            base = p * 2 * F2p
            hr = Hrows[:, base:base + F2p]
            hi = Hrows[:, base + F2p:base + 2 * F2p]
            fpr = fr2[:, p * F2p:(p + 1) * F2p]
            fpi = fi2[:, p * F2p:(p + 1) * F2p]
            yr = yr + fpr * hr - fpi * hi
            yi = yi + fpr * hi + fpi * hr
        return yr, yi

    ynr, yni = mac(H)
    if crossfade:
        m2s = started_ref[...]  # (2Sp, 1): started flag per (ear, stream)
        Hp = jnp.where(m2s > 0.5, ph_ref[...], H)
        ypr, ypi = mac(Hp)
        Yall = jnp.concatenate(
            [jnp.concatenate([ynr, yni], axis=1),
             jnp.concatenate([ypr, ypi], axis=1)], axis=0)  # (4Sp, 2F2p)
        yt = jnp.dot(Yall, di_ref[...], preferred_element_type=jnp.float32,
                     precision=hp)  # (4Sp, B)
        ramp = (jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
                .astype(jnp.float32) + 0.5) / B  # Mosaic: iota must be int
        y_out[...] = ramp * yt[:2 * Sp] + (1.0 - ramp) * yt[2 * Sp:]
    else:
        Yall = jnp.concatenate([ynr, yni], axis=1)
        y_out[...] = jnp.dot(Yall, di_ref[...],
                             preferred_element_type=jnp.float32, precision=hp)


def stream_step_vmem_bytes(taps: int, block: int, n_streams: int) -> int:
    """Rough VMEM footprint of the fused streaming step (constants + the
    PER-GRID-STEP working set — the kernel grids over stream chunks, so
    batch size itself is unbounded) for the eligibility gate."""
    M1p, M2p, trig, DFTr, DI, dims = _stream_step_mats(taps, block)
    L, FL, FLp, F2, F2p, P, taps_p = dims
    consts = (M1p.size + M2p.size + trig.size + DFTr.size + DI.size) * 4
    Sp = min(64, _round_up(max(n_streams, 1), 8))  # per-step chunk
    work = Sp * (2 * 2 * block + 2 * 2 * F2p + 4 * P * F2p
                 + 2 * (2 * FLp + taps_p)
                 + 6 * P * 2 * F2p + 12 * F2p + 4 * block) * 4
    return consts + work


@partial(jax.jit,
         static_argnames=("taps", "block", "crossfade", "interpret",
                          "precision"))
def fused_stream_step(h, d, g, xb, prev_in, fdl_re, fdl_im,
                      ph_re, ph_im, started,
                      taps: int, block: int, crossfade: bool = True,
                      interpret: bool = False,
                      precision=jax.lax.Precision.HIGHEST):
    """Batched streaming step in one Pallas launch.

    h: (S, 2, taps); d, g: (S, 2); xb, prev_in: (S, B);
    fdl_re/im: (S, P, F2); ph_re/im: (S, P, 2, F2) previous filter
    partitions; started: (S,) 1.0 after the first push.
    → (y (S, 2, B), fdl_re', fdl_im', ph_re', ph_im') in the same public
    state formats as tinaural.models.streaming.StreamState.
    """
    S, B = xb.shape
    M1p, M2p, trig, DFTr, DI, dims = _stream_step_mats(taps, block)
    L, FL, FLp, F2, F2p, P, taps_p = dims
    # Per-grid-step stream chunk: small batches stay compact, large ones
    # tile at MXU-friendly row counts; memory per step is O(chunk), so
    # the serving batch size is unbounded.
    SC = min(64, _round_up(max(S, 1), 8))
    Sp = _round_up(max(S, 1), SC)
    ps = Sp - S
    nch = Sp // SC

    def pad_s(z):  # zero-pad the stream axis S → Sp
        return jnp.pad(z, [(0, ps)] + [(0, 0)] * (z.ndim - 1))

    def ear_rows(z, lanes):  # (Sp, 2, lanes) → (2·Sp, lanes), chunk-major
        z = z.reshape(nch, SC, 2, lanes).transpose(0, 2, 1, 3)
        return z.reshape(2 * Sp, lanes)

    hR = ear_rows(pad_s(jnp.pad(h, [(0, 0), (0, 0), (0, taps_p - taps)])),
                  taps_p)
    dR = ear_rows(pad_s(d[..., None]), 1)
    gR = ear_rows(pad_s(g[..., None]), 1)

    def fdl_lanes(z):  # (S, P, F2) → (Sp, P·F2p)
        z = jnp.pad(z, [(0, ps), (0, 0), (0, F2p - F2)])
        return z.reshape(Sp, P * F2p)

    # prev_h (S, P, 2, F2) re/im → chunk-major plane rows (2·Sp, P·2F2p)
    def ph_planes(zr, zi):
        zr = jnp.pad(zr, [(0, ps), (0, 0), (0, 0), (0, F2p - F2)])
        zi = jnp.pad(zi, [(0, ps), (0, 0), (0, 0), (0, F2p - F2)])
        z = jnp.stack([zr, zi], axis=-2)      # (Sp, P, 2ear, 2reim, F2p)
        z = z.transpose(0, 2, 1, 3, 4)        # (Sp, 2ear, P, 2reim, F2p)
        return ear_rows(z.reshape(Sp, 2, P * 2 * F2p), P * 2 * F2p)

    phR = ph_planes(ph_re, ph_im)
    stS = jnp.pad(started.astype(jnp.float32), [(0, ps)])
    st = ear_rows(jnp.stack([stS, stS], axis=1)[..., None], 1)  # (2·Sp, 1)
    xbP = jnp.pad(xb, [(0, ps), (0, 0)])
    pvP = jnp.pad(prev_in, [(0, ps), (0, 0)])

    row1 = lambda n: pl.BlockSpec((SC, n), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    row2 = lambda n: pl.BlockSpec((2 * SC, n), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    M1j, M2j = jnp.asarray(M1p), jnp.asarray(M2p)
    trj, dfj, dij = jnp.asarray(trig), jnp.asarray(DFTr), jnp.asarray(DI)
    outs = pl.pallas_call(
        partial(_stream_step_kernel, crossfade, SC, block, FLp, F2p, P,
                precision),
        grid=(nch,),
        in_specs=[row1(block), row1(block),
                  row1(P * F2p), row1(P * F2p),
                  row2(P * 2 * F2p), row2(1),
                  row2(taps_p), row2(1), row2(1),
                  const(M1j), const(M2j), const(trj), const(dfj),
                  const(dij)],
        out_specs=(row2(block), row1(P * F2p), row1(P * F2p),
                   row2(P * 2 * F2p)),
        out_shape=(jax.ShapeDtypeStruct((2 * Sp, block), jnp.float32),
                   jax.ShapeDtypeStruct((Sp, P * F2p), jnp.float32),
                   jax.ShapeDtypeStruct((Sp, P * F2p), jnp.float32),
                   jax.ShapeDtypeStruct((2 * Sp, P * 2 * F2p), jnp.float32)),
        interpret=interpret,
    )(pvP, xbP, fdl_lanes(fdl_re), fdl_lanes(fdl_im), phR, st,
      hR, dR, gR, M1j, M2j, trj, dfj, dij)

    yR, nfr, nfi, nh = outs

    def un_ear_rows(z):  # chunk-major (2·Sp, lanes) → (Sp, 2, lanes)
        z = z.reshape(nch, 2, SC, -1).transpose(0, 2, 1, 3)
        return z.reshape(Sp, 2, z.shape[-1])

    y = un_ear_rows(yR)[:S]  # (S, 2, B)
    fdl_re2 = nfr.reshape(Sp, P, F2p)[:S, :, :F2]
    fdl_im2 = nfi.reshape(Sp, P, F2p)[:S, :, :F2]
    nh = un_ear_rows(nh).reshape(Sp, 2, P, 2, F2p)  # (Sp, ear, P, reim, F2p)
    ph_re2 = nh[:S, :, :, 0].transpose(0, 2, 1, 3)[..., :F2]  # (S, P, 2, F2)
    ph_im2 = nh[:S, :, :, 1].transpose(0, 2, 1, 3)[..., :F2]
    return y, fdl_re2, fdl_im2, ph_re2, ph_im2
