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


def _dot3(a: jax.Array, b: jax.Array) -> jax.Array:
    """~f32 matmul in 3 bf16 MXU passes (vs HIGHEST's 6).

    Split both operands hi/lo (x = bf16(x) + bf16(x − bf16(x)), 16-bit
    effective mantissa) and drop only the lo·lo term (~2⁻¹⁶ relative ≈
    96 dB — inside the ≥60 dB parity budget with margin, measured ~90 dB
    end-to-end). The hi/lo splits are cheap VPU ops; each product is one
    full-rate bf16 MXU pass."""
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    f = jnp.float32
    return (jnp.dot(ah, bh, preferred_element_type=f)
            + jnp.dot(ah, bl, preferred_element_type=f)
            + jnp.dot(al, bh, preferred_element_type=f))


def _kdot(precision):
    """In-kernel matmul for the given precision setting: the string
    ``"tri"`` selects the 3-pass split-bf16 `_dot3`; anything else is a
    jax.lax.Precision passed to jnp.dot."""
    if precision == "tri":
        return _dot3
    return lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32,
                                precision=precision)


def _tile_fft(groups, n: int, sign: float):
    """Radix-2 DIT FFT across a Python list of equal-shape VMEM tiles.

    The four-step FFT's short dimension (n1 = n_fft/128 ∈ {4, 8, 16})
    runs across lane-group tiles; a dense n1×n1 combine costs n1² complex
    tile-multiplies on the VPU, which profiling showed dominating the
    fused block kernels. This is the classic butterfly network instead —
    O(n1·log n1) tile ops, with unit/±j twiddles free and the bit-reversal
    a compile-time list reorder.

    ``groups``: length-n list of (re, im) tile pairs or None (a zero tile
    — zero-padded input groups cost nothing). ``sign``: −1 forward, +1
    inverse (unscaled). Returns n (re, im) pairs.
    """
    assert n & (n - 1) == 0
    bits = n.bit_length() - 1
    idx = [int(format(i, f"0{bits}b")[::-1], 2) for i in range(n)]
    a = [groups[i] for i in idx]  # bit-reversed input order

    def cmul(t, wr, wi):  # t·(wr + j·wi) with free special cases
        if t is None:
            return None
        tr, ti = t
        if abs(wr - 1.0) < 1e-12 and abs(wi) < 1e-12:
            return t
        if abs(wr + 1.0) < 1e-12 and abs(wi) < 1e-12:
            return (-tr, -ti)
        if abs(wr) < 1e-12 and abs(wi - 1.0) < 1e-12:
            return (-ti, tr)
        if abs(wr) < 1e-12 and abs(wi + 1.0) < 1e-12:
            return (ti, -tr)
        if abs(wi) < 1e-12:
            return (wr * tr, wr * ti)
        if abs(wr) < 1e-12:
            return (-wi * ti, wi * tr)
        return (wr * tr - wi * ti, wr * ti + wi * tr)

    def badd(x, y, neg):  # x ± y with None-as-zero propagation
        if y is None:
            return x
        if x is None:
            return (-y[0], -y[1]) if neg else y
        return (x[0] - y[0], x[1] - y[1]) if neg else (x[0] + y[0],
                                                       x[1] + y[1])

    half = 1
    while half < n:
        step = n // (2 * half)
        out = list(a)
        for base in range(0, n, 2 * half):
            for k in range(half):
                ang = sign * 2.0 * np.pi * k * step / n
                t = cmul(a[base + half + k], float(np.cos(ang)),
                         float(np.sin(ang)))
                out[base + k] = badd(a[base + k], t, neg=False)
                out[base + half + k] = badd(a[base + k], t, neg=True)
        a = out
        half *= 2
    zero = None
    for t in a:
        if t is not None:
            zero = (jnp.zeros_like(t[0]), jnp.zeros_like(t[1]))
            break
    return [t if t is not None else zero for t in a]


# Mosaic's f32 tile minimum along sublanes: every kernel here keeps row
# counts (chunks, carries, scratch rows) at multiples of 8.
_F32_TILE_ROWS = 8


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
    from .filters import _clip_delay

    theta = trig_ref[0:1, :]
    sin_t = trig_ref[1:2, :]
    cos_t = trig_ref[2:3, :]
    w = trig_ref[3:4, :]
    dc = _clip_delay(d)
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


def _assembly_dims(taps: int, n_fft: int):
    """Shape arithmetic of the assembly chain WITHOUT materialising the
    zoom matrices: (L, FL, FLp, T_pad, Tp_p, Fn, Fnp, taps_p). The VMEM
    estimators must use this — building the matrices just to read their
    dims costs minutes at BRIR sizes (found by the round-4 oversized-gate
    test)."""
    from .filters import DELAY_PAD, next_pow2

    T_pad = taps + DELAY_PAD
    L = next_pow2(T_pad)
    FL = L // 2 + 1
    Fn = n_fft // 2 + 1
    return (L, FL, _round_up(FL, 128), T_pad, _round_up(T_pad, 128),
            Fn, _round_up(Fn, 128), _round_up(taps, 128))


@lru_cache(maxsize=8)
def _padded_assembly_mats(taps: int, n_fft: int, with_ma: bool = True):
    """Zoom matrices padded to TPU lane multiples.

    Returns (M1p (taps_p, 2·FLp), MBp (2·FLp, Tp_p), MAp (Tp_p, 2·Fnp),
    dims) with dims = `_assembly_dims(taps, n_fft)`. Columns
    [FLp:FLp+FL) hold the imaginary planes so each plane is lane-aligned.
    ``with_ma=False`` skips the (largest) MAp build and returns None in
    its slot — for callers that replace the MA stage (the scrambled
    mats build their own signed-permutation MA; the filter-fft route
    needs none at all).
    """
    from .filters import _hybrid_matrices, _rfft_matrix

    L, FL, FLp, T_pad, Tp_p, Fn, Fnp, taps_p = _assembly_dims(taps, n_fft)

    M1, MB = _hybrid_matrices(taps)      # (taps, 2FL), (2FL, T_pad)

    M1p = np.zeros((taps_p, 2 * FLp), np.float32)
    M1p[:taps, :FL] = M1[:, :FL]
    M1p[:taps, FLp:FLp + FL] = M1[:, FL:]

    MBp = np.zeros((2 * FLp, Tp_p), np.float32)
    MBp[:FL, :T_pad] = MB[:FL]
    MBp[FLp:FLp + FL, :T_pad] = MB[FL:]

    MAp = None
    if with_ma:
        MA = _rfft_matrix(taps, n_fft)    # (T_pad, 2Fn)
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
    dot = _kdot(precision)  # honours kernel_precision="tri" like every
    h = h_ref[...]          # other fused kernel (round-3 advisor finding)
    d = d_ref[...]          # (R, 1)
    g = g_ref[...]

    G = dot(h, m1_ref[...])  # (R, 2FLp)

    c, s = _ramp_cos_sin(d, trig_ref)

    Gr = G[:, :FLp]
    Gi = G[:, FLp:]
    G2 = jnp.concatenate([(Gr * c - Gi * s) * g, (Gr * s + Gi * c) * g],
                         axis=1)  # (R, 2FLp)
    h_eff = dot(G2, mb_ref[...])  # (R, Tp_p)
    H = dot(h_eff, ma_ref[...])  # (R, 2Fnp)

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
    working set, used to gate kernel eligibility (long BRIRs overflow).
    Pure shape arithmetic — never materialises the matrices."""
    L, FL, FLp, T_pad, Tp_p, Fn, Fnp, taps_p = _assembly_dims(taps, n_fft)
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


# ============ fully-fused block step: forward FFT + assembly + MAC ===========
#
# The round-3 extension of the assembly+MAC kernel (the remaining XLA stage
# on its input side was the packed forward rfft of the up/down-ramped
# blocks). This variant takes the RAW time blocks and runs the forward FFT
# in-kernel as the same four-step factorization the epilogue kernel inverts,
# producing block output spectra directly in the epilogue's scrambled-half
# layout — so between the raw input samples and the final OLA'd stereo
# samples, NOTHING but the two kernels touches HBM, and no XLA FFT runs at
# all on the block path (the BASELINE.json:5 north star: "fused Pallas
# rfft→complex-multiply→irfft overlap-add").
#
#   xb ──ramp──▶ z = xu + j·xd ──four-step fwd FFT──▶ Zf, C = conj(Zf[−k])
#   h,d,g ──zoom matmuls (M1 → ramp·gain → MB → MA_scram)──▶ Hc (+ carry Hp)
#   Y_e = Xu·Hc_e + Xd·Hp_e  ≡  Zf·G1_e + C·G2_e,
#       G1 = (Hc − j·Hp)/2, G2 = (Hc + j·Hp)/2
#
# C (the Hermitian mirror of Zf) costs one extra matmul set against a
# lane-flipped DFT constant — no reversal op exists or is needed. The whole
# derivation was validated to 1e-12 against numpy.fft before implementation;
# interpret-mode parity tests + the on-chip gate pin it.


@lru_cache(maxsize=8)
def _scrambled_assembly_mats(taps: int, n_fft: int):
    """`_padded_assembly_mats` with MA emitting the scrambled-half bins of
    `_epilogue_dims` (columns are a signed permutation of the natural
    rfft matrix's — same size, same oracle derivation). When the shape
    takes the in-kernel filter-FFT route (`use_filter_fft`), the MA
    stage does not exist and its slot carries a tile-shaped placeholder
    — the (Tp_p, 2·Fs) matrix (~12 MB at BRIR taps) is never built."""
    from .filters import _rfft_matrix

    M1p, MBp, _, trig, dims = _padded_assembly_mats(taps, n_fft,
                                                    with_ma=False)
    L, FL, FLp, T_pad, Tp_p, Fn, Fnp, taps_p = dims
    if use_filter_fft(taps, n_fft):
        return M1p, MBp, np.zeros((8, 128), np.float32), trig, dims
    idx, sgn = _scramble_maps(n_fft)
    Fs = idx.shape[0]
    MA = _rfft_matrix(taps, n_fft)  # (T_pad, 2Fn) natural [Re | Im]
    MAs = np.zeros((Tp_p, 2 * Fs), np.float32)
    MAs[:T_pad, :Fs] = MA[:, idx]
    MAs[:T_pad, Fs:] = MA[:, Fn + idx] * sgn[None, :]
    return M1p, MBp, MAs, trig, dims


@lru_cache(maxsize=8)
def _forward_fft_consts(n_fft: int):
    """Forward four-step constants: the stage-3 DFT matrix pair (direct /
    lane-flipped for the Hermitian mirror C) and per-group twiddles."""
    n1 = n_fft // 128
    k2 = np.arange(128)
    ang = -2.0 * np.pi * np.outer(k2, k2) / 128.0  # [i2, k2]
    Wc = np.cos(ang) + 1j * np.sin(ang)
    angf = -2.0 * np.pi * np.outer(k2, 127 - k2) / 128.0  # [i2, 127−k2]
    Wfc = np.cos(angf) + 1j * np.sin(angf)
    tw = np.exp(-2j * np.pi * np.outer(np.arange(n1), k2) / n_fft)
    twp = np.zeros((max(n1, 8), 128), np.complex128)
    twp[:n1] = tw
    return (Wc.real.astype(np.float32), Wc.imag.astype(np.float32),
            Wfc.real.astype(np.float32), Wfc.imag.astype(np.float32),
            twp.real.astype(np.float32), twp.imag.astype(np.float32))


def _forward_fourstep(zr, zi, n1: int, Gh: int, chunk: int,
                      fwr, fwi, ffr, ffi, ftr, fti, precision,
                      need_mirror: bool):
    """In-kernel forward FFT of (chunk, B≤n_fft) complex rows → scrambled
    group tiles. Returns (Zf_r, Zf_i, C_r, C_i) each (Gh·chunk, 128) with
    group kk at rows [kk·chunk, (kk+1)·chunk); C is conj(Zf[−k]) (None
    pair when ``need_mirror`` is False — the no-crossfade path)."""
    dot = _kdot(precision)
    B = zr.shape[-1]
    ng_in = B // 128
    zg_r = [zr[:, i * 128:(i + 1) * 128] for i in range(ng_in)]
    zg_i = [zi[:, i * 128:(i + 1) * 128] for i in range(ng_in)] \
        if zi is not None else None

    # stage 1: S1[k1] = Σ_i1 z_group[i1]·e^{−2πj·i1·k1/n1} — a radix-2
    # butterfly network over the group tiles (O(n1·log n1) VPU ops; the
    # zero-padded upper groups cost nothing). stage 2: twiddle rows.
    if zg_i is None:
        zeros = jnp.zeros_like(zg_r[0])
        gl = [(zg_r[i], zeros) if i < ng_in else None for i in range(n1)]
    else:
        gl = [(zg_r[i], zg_i[i]) if i < ng_in else None for i in range(n1)]
    S1 = _tile_fft(gl, n1, -1.0)
    T_r, T_i = [], []
    for kk in range(n1):
        ar, ai = S1[kk]
        tr_row, ti_row = ftr[kk:kk + 1, :], fti[kk:kk + 1, :]
        T_r.append(ar * tr_row - ai * ti_row)
        T_i.append(ar * ti_row + ai * tr_row)

    # stage 3 (MXU): direct groups 0..Gh−1 against Wc in one stacked
    # matmul pair.
    Ar = jnp.concatenate(T_r[:Gh], axis=0)  # (Gh·chunk, 128)
    Ai = jnp.concatenate(T_i[:Gh], axis=0)
    W, Wi = fwr[...], fwi[...]
    Zf_r = dot(Ar, W) - dot(Ai, Wi)
    Zf_i = dot(Ar, Wi) + dot(Ai, W)
    if not need_mirror:
        return Zf_r, Zf_i, None, None

    # C group 0: conj(T0 @ conj(Wc)); groups 1..Gh−1: conj(T[n1−kk] @ Wfc).
    U0_r = dot(T_r[0], W) + dot(T_i[0], Wi)      # T0 @ conj(Wc), real part
    U0_i = -dot(T_r[0], Wi) + dot(T_i[0], W)     # imag part
    if Gh == 1:  # n1 = 1: group 0 is the whole spectrum, no mirror tiles
        return Zf_r, Zf_i, U0_r, -U0_i
    Br = jnp.concatenate([T_r[n1 - kk] for kk in range(1, Gh)], axis=0)
    Bi = jnp.concatenate([T_i[n1 - kk] for kk in range(1, Gh)], axis=0)
    Wf, Wfi_ = ffr[...], ffi[...]
    Um_r = dot(Br, Wf) - dot(Bi, Wfi_)
    Um_i = dot(Br, Wfi_) + dot(Bi, Wf)
    C_r = jnp.concatenate([U0_r, Um_r], axis=0)
    C_i = -jnp.concatenate([U0_i, Um_i], axis=0)  # conj
    return Zf_r, Zf_i, C_r, C_i


# Padded-table row bound of the in-kernel gather: the one-hot row-select
# compares an f32 iota against f32 indices (exact far beyond this, but the
# (chunk, rows_p) one-hot weights + the VMEM-resident table are the real
# limit). `gather_tables` enforces it at the public surface.
_GATHER_MAX_ROWS = 2048


def _vmem_gather(dot, idx_ref, w_ref, ht_ref, dg_ref, chunk: int,
                 taps_p: int, apply_itd: bool, apply_ild: bool):
    """In-kernel HRTF gather+lerp: the whole (padded) table rides VMEM and
    the 4-neighbor bilinear gather is ONE weighted one-hot matmul — no
    XLA gather op, no HBM h-row traffic, no chunk-major layout glue.
    idx/w: (chunk, 8) f32 cols 0..3 = flat neighbor rows / weights;
    ht: (rows_p, 2·taps_p) [ear0 | ear1] shapes; dg: (rows_p, 128) cols
    [d0, d1, g0, g1]. → (h (2·chunk, taps_p), d (2·chunk, 1),
    g (2·chunk, 1)) in the assembly chain's ear-major row layout."""
    rows_p = ht_ref.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, rows_p),
                                    1).astype(jnp.float32)
    idx, w = idx_ref[...], w_ref[...]
    Wg = None
    for k in range(4):
        t = jnp.where(iota == idx[:, k:k + 1], w[:, k:k + 1], 0.0)
        Wg = t if Wg is None else Wg + t
    hg = dot(Wg, ht_ref[...])  # (chunk, 2·taps_p)
    h = jnp.concatenate([hg[:, :taps_p], hg[:, taps_p:]], axis=0)
    if apply_itd or apply_ild:
        # delays feed a phase ramp, so their lerp is precision-critical
        # (split-bf16 here measured ~82 dB end-to-end vs ~100); this
        # matmul is 4 MFLOP — full f32 always.
        dgg = jnp.dot(Wg, dg_ref[...], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)  # (chunk, 128)
        # extract columns via masked reductions: slicing lanes 1..3
        # directly yields tiles at mismatched lane offsets, whose row
        # concat Mosaic cannot lower ("offset mismatch on non-concat
        # dimension" — found by the on-chip compile check).
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        colv = lambda k: jnp.sum(jnp.where(lane == k, dgg, 0.0), axis=1,
                                 keepdims=True)  # (chunk, 1), offset 0
    if apply_itd:
        d = jnp.concatenate([colv(0), colv(1)], axis=0)
    else:
        d = jnp.full((2 * chunk, 1), ALIGN_GUARD, jnp.float32)
    if apply_ild:
        g = jnp.concatenate([colv(2), colv(3)], axis=0)
    else:
        g = jnp.ones((2 * chunk, 1), jnp.float32)
    return h, d, g


def use_filter_fft(taps: int, n_fft: int) -> bool:
    """Route the in-kernel filter rfft through the four-step FFT instead
    of the dense MAs matmul when the effective filter spans more than
    two 128-lane groups: stage-3 MACs are 4·Gh·128² per row regardless
    of taps, vs the dense 2·Tp_p·Fs — equal at Tp_p = 256, ~2.5× fewer
    at Tp_p = 640 (512-tap KEMAR) — and the (Tp_p, 2·Fs) MAs constant
    leaves VMEM entirely (11.8 MB at 512 taps), which is what brings
    long-tap filters under the kernel budget."""
    Tp_p = _assembly_dims(taps, n_fft)[4]
    return Tp_p > 256


_EXPAND_IMPL = "matmul"  # "matmul" | "broadcast" — see _expand_rows


def _expand_rows(Hu: jax.Array, k: int, chunk: int, precision) -> jax.Array:
    """Repeat each filter row k× along sublanes: (chunk/k, F) → (chunk, F)
    with out[r] = Hu[r // k] — the dir_rate expansion.

    Two lowerings, A/B'd on chip: "broadcast" (broadcast_to + reshape —
    VPU sublane copies, which measured EXPENSIVE enough on v5e to erase
    dir_rate's assembly savings in the scene kernel) and "matmul"
    (out = E @ Hu with the 0/1 one-hot E built from iotas — a trivial
    (chunk, cu)-by-(cu, F) MXU op). E is exact in bf16; Hu rides a hi/lo
    split (2 bf16 passes, ~2⁻¹⁷ relative — the tri error class) unless
    the kernel precision is HIGHEST, which keeps full f32."""
    if k == 1:
        return Hu
    cu = chunk // k
    F = Hu.shape[-1]
    if _EXPAND_IMPL == "broadcast":
        return jnp.broadcast_to(Hu[:, None, :], (cu, k, F)).reshape(chunk, F)
    ri = jax.lax.broadcasted_iota(jnp.int32, (chunk, cu), 0) // k
    ci = jax.lax.broadcasted_iota(jnp.int32, (chunk, cu), 1)
    f = jnp.float32
    if precision == "tri":
        E = (ri == ci).astype(jnp.bfloat16)
        hh = Hu.astype(jnp.bfloat16)
        hl = (Hu - hh.astype(jnp.float32)).astype(jnp.bfloat16)
        return (jnp.dot(E, hh, preferred_element_type=f)
                + jnp.dot(E, hl, preferred_element_type=f))
    E = (ri == ci).astype(jnp.float32)
    return jnp.dot(E, Hu, preferred_element_type=f,
                   precision=jax.lax.Precision.HIGHEST)


def _block_spectra_core(crossfade: bool, n1: int, Gh: int, B: int,
                        FLp: int, Fs: int, precision, chunk: int, cs,
                        h_val, d_val, g_val, first_ref, xb_ref,
                        m1_ref, mb_ref, ma_ref, trig_ref,
                        fwr, fwi, ffr, ffi, ftr, fti, carry,
                        dir_rate: int = 1, filter_fft: bool = False):
    """Shared core of the fused block kernels: forward four-step FFT of
    the (ramped) raw blocks + filter assembly at the scrambled bins +
    crossfaded MAC, with the previous filter carried in `carry` rows
    [cs, cs+1]. h/d/g are VALUES ((2·chunk/dir_rate, ·) ear-major rows —
    read from refs or produced by `_vmem_gather`); with dir_rate = k > 1
    only the chunk/k UNIQUE filters are assembled (the RenderConfig.
    dir_rate fast path) and each is expanded to its k blocks before the
    MAC — identical math to assembling the snapped track per block.

    ``filter_fft``: compute the filter's scrambled rfft by running h_eff
    through the SAME in-kernel four-step the signal path uses (reusing
    its constants) instead of the dense MAs matmul. Identical linear map
    (the scrambled lane holds the true FFT value at bin k1 + n1·k2; for
    the real h_eff no Hermitian mirror is needed). Stage-3 MACs are
    4·Gh·128² per row vs the dense 2·Tp_p·Fs — a wash at Tp_p = 256
    (short taps) but ~2.5× fewer at Tp_p = 640 (512-tap KEMAR), and the
    (Tp_p, 2·Fs) MAs constant (11.8 MB at 512 taps) drops out of VMEM,
    which is what makes long-tap filters kernel-eligible at all.
    → ((y0r, y0i), (y1r, y1i)) plane values, (chunk, Fs)."""
    hp = precision
    dot = _kdot(hp)
    cu = chunk // dir_rate

    # ---- filter assembly at scrambled bins (same chain as
    # _assembly_mac_kernel; only MA's column layout differs)
    G = dot(h_val, m1_ref[...])
    c, s = _ramp_cos_sin(d_val, trig_ref)
    g = g_val
    Gr, Gi = G[:, :FLp], G[:, FLp:]
    G2 = jnp.concatenate([(Gr * c - Gi * s) * g, (Gr * s + Gi * c) * g],
                         axis=1)
    h_eff = dot(G2, mb_ref[...])
    if filter_fft:
        rows = 2 * cu
        Hf_r, Hf_i, _, _ = _forward_fourstep(
            h_eff, None, n1, Gh, rows, fwr, fwi, ffr, ffi, ftr, fti, hp,
            need_mirror=False)
        hl = lambda Z: jnp.concatenate(
            [Z[kk * rows:(kk + 1) * rows] for kk in range(Gh)], axis=1)
        H = jnp.concatenate([hl(Hf_r), hl(Hf_i)], axis=1)  # (2cu, 2Fs)
    else:
        H = dot(h_eff, ma_ref[...])  # (2·cu, 2Fs) rows [ear0; ear1]
    Hc0 = _expand_rows(H[:cu], dir_rate, chunk, hp)
    Hc1 = _expand_rows(H[cu:], dir_rate, chunk, hp)

    # ---- forward FFT of the raw blocks
    xb = xb_ref[...]  # (chunk, B)
    if crossfade:
        ramp = ((jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
                 .astype(jnp.float32) + 0.5) / B)
        xu = xb * ramp
        Zf_r, Zf_i, C_r, C_i = _forward_fourstep(
            xu, xb - xu, n1, Gh, chunk, fwr, fwi, ffr, ffi, ftr, fti, hp,
            need_mirror=True)
    else:
        Zf_r, Zf_i, _, _ = _forward_fourstep(
            xb, None, n1, Gh, chunk, fwr, fwi, ffr, ffi, ftr, fti, hp,
            need_mirror=False)

    # group-stacked rows → lane-grouped planes matching H's layout
    lanes = lambda Z: jnp.concatenate(
        [Z[kk * chunk:(kk + 1) * chunk] for kk in range(Gh)], axis=1)
    Xr, Xi = lanes(Zf_r), lanes(Zf_i)  # (chunk, Fs)

    if crossfade:
        fm = first_ref[...]  # (chunk, 1)
        prev0 = jnp.concatenate([carry[pl.ds(cs, 1)], Hc0[:-1]], axis=0)
        prev1 = jnp.concatenate([carry[pl.ds(cs + 1, 1)], Hc1[:-1]], axis=0)
        Hp0 = jnp.where(fm > 0.5, Hc0, prev0)
        Hp1 = jnp.where(fm > 0.5, Hc1, prev1)
        carry[pl.ds(cs, 1)] = Hc0[-1:]
        carry[pl.ds(cs + 1, 1)] = Hc1[-1:]
        Cr, Ci = lanes(C_r), lanes(C_i)
        outs = []
        for Hce, Hpe in ((Hc0, Hp0), (Hc1, Hp1)):
            hcr, hci = Hce[:, :Fs], Hce[:, Fs:]
            hpr, hpi = Hpe[:, :Fs], Hpe[:, Fs:]
            g1r, g1i = 0.5 * (hcr + hpi), 0.5 * (hci - hpr)
            g2r, g2i = 0.5 * (hcr - hpi), 0.5 * (hci + hpr)
            outs.append((Xr * g1r - Xi * g1i + Cr * g2r - Ci * g2i,
                         Xr * g1i + Xi * g1r + Cr * g2i + Ci * g2r))
        return outs
    outs = []
    for Hce in (Hc0, Hc1):
        hcr, hci = Hce[:, :Fs], Hce[:, Fs:]
        outs.append((Xr * hcr - Xi * hci, Xr * hci + Xi * hcr))
    return outs


def _assembly_mac_s_kernel(crossfade: bool, n1: int, Gh: int, B: int,
                           FLp: int, Fs: int, precision, chunk: int,
                           mix: bool, filter_fft: bool, dir_rate: int,
                           h_ref, d_ref, g_ref, first_ref, xb_ref,
                           m1_ref, mb_ref, ma_ref, trig_ref,
                           fwr, fwi, ffr, ffi, ftr, fti,
                           y0r_o, y0i_o, y1r_o, y1i_o, carry):
    """One grid step: in-kernel forward FFT of `chunk` raw blocks +
    filter assembly (2·chunk ear rows) + crossfaded MAC at the
    scrambled-half bins. Outputs the 4 f32 spectrum planes
    `fused_epilogue` consumes.

    ``mix`` is the scene-mixdown mode: the grid is (nb/chunk, S) with the
    source index s iterating FASTEST, the output tile for block-chunk i is
    revisited (staying VMEM-resident) and accumulated across sources —
    the matmul-k-loop pattern — and the crossfade Hp carry lives in a
    per-source scratch slice so consecutive i-steps of the same source
    chain correctly."""
    cs = 2 * pl.program_id(1) if mix else 0
    outs = _block_spectra_core(
        crossfade, n1, Gh, B, FLp, Fs, precision, chunk, cs,
        h_ref[...], d_ref[...], g_ref[...], first_ref, xb_ref,
        m1_ref, mb_ref, ma_ref, trig_ref,
        fwr, fwi, ffr, ffi, ftr, fti, carry, dir_rate=dir_rate,
        filter_fft=filter_fft)

    refs = ((y0r_o, y0i_o), (y1r_o, y1i_o))
    if mix:
        # source axis iterates fastest: the output tile stays VMEM-resident
        # across the s-sweep; initialise at s == 0, accumulate after.
        @pl.when(pl.program_id(1) == 0)
        def _():
            for (yr_o, yi_o), (vr, vi) in zip(refs, outs):
                yr_o[...] = vr
                yi_o[...] = vi

        @pl.when(pl.program_id(1) != 0)
        def _():
            for (yr_o, yi_o), (vr, vi) in zip(refs, outs):
                yr_o[...] = yr_o[...] + vr
                yi_o[...] = yi_o[...] + vi
    else:
        for (yr_o, yi_o), (vr, vi) in zip(refs, outs):
            yr_o[...] = vr
            yi_o[...] = vi


def assembly_mac_s_vmem_bytes(taps: int, n_fft: int) -> int:
    """VMEM footprint estimate of the fully-fused block step (constants +
    per-grid-step working set) for the eligibility gate. Pure shape
    arithmetic — never materialises the matrices."""
    L, FL, FLp, T_pad, Tp_p, Fn, Fnp, taps_p = _assembly_dims(taps, n_fft)
    n1 = n_fft // 128
    Gh = n1 // 2 + 1
    Fs = Gh * 128
    ma_sz = 0 if use_filter_fft(taps, n_fft) else Tp_p * 2 * Fs
    mats = (taps_p * 2 * FLp + 2 * FLp * Tp_p + ma_sz + 8 * FLp)
    consts = mats * 4 + (4 * 128 * 128 + 2 * max(n1, 8) * 128) * 4
    ch = _DEFAULT_CHUNK
    work = ch * (taps_p * 2 + 4 * FLp * 2 + Tp_p * 2 + 2 * 2 * Fs  # assembly
                 + n_fft + 4 * n1 * 128 + 4 * Gh * 128              # fwd fft
                 + 8 * Fs + 4 * Fs) * 4                             # MAC + out
    return consts + work + 8 * 2 * Fs * 4


@partial(jax.jit,
         static_argnames=("taps", "n_fft", "crossfade", "interpret",
                          "precision", "chunk", "dir_rate"))
def fused_block_step(h: jax.Array, d: jax.Array, g: jax.Array,
                     xb: jax.Array, first: jax.Array,
                     taps: int, n_fft: int, crossfade: bool = True,
                     interpret: bool = False,
                     precision=jax.lax.Precision.HIGHEST,
                     chunk: int | None = None, dir_rate: int = 1):
    """Forward FFT + filter assembly + crossfaded MAC in one Pallas launch.

    h: (nb, 2, taps); d, g: (nb, 2); xb: (nb, B) RAW time blocks (the
    up/down crossfade ramps are applied in-kernel); first: (nb,) f32.
    → (Ysr, Ysi): (nb, 2, Fs) f32 block-spectrum planes in the
    scrambled-half layout of `fused_epilogue` — chain the two for the
    fully-fused block path (no XLA FFT anywhere).

    ``dir_rate`` = k > 1: callers pass SNAPPED per-block h/d/g (the
    RenderConfig.dir_rate semantics); only rows [::k] are read and the
    chunk/k unique filters are assembled per grid step. Requires
    k | chunk and chunk/k ≥ 8, and every source's span in the flattened
    batch must be a multiple of the chunk (the renderer's padding
    guarantees this).
    """
    nb, B = xb.shape
    n1, Gh, Fs, _ = _epilogue_dims(n_fft, 128)
    first = first.at[0].set(1.0)
    _CHUNK = chunk if chunk is not None else _DEFAULT_CHUNK
    M1p, MBp, MAs, trig, dims = _scrambled_assembly_mats(taps, n_fft)
    L, FL, FLp, T_pad, Tp_p, Fn, Fnp, taps_p = dims
    ff = use_filter_fft(taps, n_fft)  # ff → MAs is the (8, 128) stub
    fwr, fwi, ffr, ffi, ftr, fti = _forward_fft_consts(n_fft)

    k = dir_rate
    if _CHUNK % k or _CHUNK // k < _F32_TILE_ROWS:
        raise ValueError(f"dir_rate {k} incompatible with chunk {_CHUNK}")
    cu = _CHUNK // k
    nbp = _round_up(max(nb, 1), _CHUNK)
    pb = nbp - nb
    nch = nbp // _CHUNK
    R = 2 * cu

    def rows(z, lanes):  # (nb, 2, lanes) → chunk-major (2·nbp/k, lanes)
        z = jnp.pad(z, [(0, pb)] + [(0, 0)] * (z.ndim - 1))
        if k > 1:
            z = z[::k]
        z = z.reshape(nch, cu, 2, -1).transpose(0, 2, 1, 3)
        return z.reshape(2 * (nbp // k), lanes)

    hR = rows(jnp.pad(h, [(0, 0), (0, 0), (0, taps_p - taps)]), taps_p)
    dR = rows(d[..., None], 1)
    gR = rows(g[..., None], 1)
    fm = jnp.pad(first.astype(jnp.float32), [(0, pb)],
                 constant_values=1.0)[..., None]
    xbP = jnp.pad(xb, [(0, pb), (0, 0)])

    vecB = pl.BlockSpec((_CHUNK, B), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    outS = pl.BlockSpec((_CHUNK, Fs), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    col = lambda r: pl.BlockSpec((r, 1), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    rowblk = lambda n: pl.BlockSpec((R, n), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)

    cj = [jnp.asarray(a) for a in (M1p, MBp, MAs, trig,
                                   fwr, fwi, ffr, ffi, ftr, fti)]
    outs = pl.pallas_call(
        partial(_assembly_mac_s_kernel, crossfade, n1, Gh, B, FLp, Fs,
                precision, _CHUNK, False, ff, k),
        grid=(nch,),
        in_specs=[rowblk(taps_p), col(R), col(R), col(_CHUNK), vecB]
        + [const(a) for a in cj],
        out_specs=(outS, outS, outS, outS),
        out_shape=tuple(jax.ShapeDtypeStruct((nbp, Fs), jnp.float32)
                        for _ in range(4)),
        scratch_shapes=[pltpu.VMEM((8, 2 * Fs), jnp.float32)],
        interpret=interpret,
    )(hR, dR, gR, fm, xbP, *cj)
    y0r, y0i, y1r, y1i = outs
    Ysr = jnp.stack([y0r[:nb], y1r[:nb]], axis=1)  # (nb, 2, Fs)
    Ysi = jnp.stack([y0i[:nb], y1i[:nb]], axis=1)
    return Ysr, Ysi


def block_mix_vmem_bytes(taps: int, n_fft: int, n_sources: int) -> int:
    """VMEM estimate of the scene-mixdown block step: the fully-fused
    step's footprint plus the per-source crossfade-carry scratch."""
    n1 = n_fft // 128
    Fs = (n1 // 2 + 1) * 128
    return (assembly_mac_s_vmem_bytes(taps, n_fft)
            + 2 * max(n_sources, 4) * 2 * Fs * 4)


@partial(jax.jit,
         static_argnames=("taps", "n_fft", "crossfade", "interpret",
                          "precision", "chunk"))
def fused_block_step_mix(h: jax.Array, d: jax.Array, g: jax.Array,
                         xbs: jax.Array,
                         taps: int, n_fft: int, crossfade: bool = True,
                         interpret: bool = False,
                         precision=jax.lax.Precision.HIGHEST,
                         chunk: int | None = None):
    """Whole-scene fused block step WITH frequency-domain mixdown: the
    forward FFT + assembly + crossfaded MAC of `fused_block_step` for
    EVERY (source, block), accumulated over sources inside the kernel.

    h: (S, nb, 2, taps); d, g: (S, nb, 2); xbs: (S, nb, B) raw blocks →
    (Ysr, Ysi): (nb, 2, Fs) f32 MIXED block-spectrum planes, ready for
    `fused_epilogue`. One launch renders the whole scene's spectra: the
    grid is (nb/chunk, S) with sources iterating fastest, so each output
    tile is computed once and revisited S times in VMEM (round-2 VERDICT
    weak #1: the chunked lax.scan serialized 8 launch+epilogue rounds and
    materialised per-chunk spectra; here neither exists).
    """
    S, nb, B = xbs.shape
    n1, Gh, Fs, _ = _epilogue_dims(n_fft, 128)
    # Round short scenes up to the 8-row f32 tile minimum — a chunk of
    # nb < 8 would hand Mosaic a sub-tile block (round-3 advisor finding;
    # padding already covers nb < chunk).
    _CHUNK = chunk if chunk is not None else min(
        _DEFAULT_CHUNK, _round_up(nb, _F32_TILE_ROWS))
    M1p, MBp, MAs, trig, dims = _scrambled_assembly_mats(taps, n_fft)
    L, FL, FLp, T_pad, Tp_p, Fn, Fnp, taps_p = dims
    ff = use_filter_fft(taps, n_fft)  # ff → MAs is the (8, 128) stub
    fwr, fwi, ffr, ffi, ftr, fti = _forward_fft_consts(n_fft)

    nbs = _round_up(nb, _CHUNK)
    pb = nbs - nb
    nchb = nbs // _CHUNK
    R = 2 * _CHUNK

    def rows(z, lanes):  # (S, nb, 2, lanes) → chunk-major (2·S·nbs, lanes)
        z = jnp.pad(z, [(0, 0), (0, pb)] + [(0, 0)] * (z.ndim - 2))
        z = z.reshape(S * nchb, _CHUNK, 2, -1).transpose(0, 2, 1, 3)
        return z.reshape(2 * S * nbs, lanes)

    hR = rows(jnp.pad(h, [(0, 0), (0, 0), (0, 0), (0, taps_p - taps)]),
              taps_p)
    dR = rows(d[..., None], 1)
    gR = rows(g[..., None], 1)
    first = jnp.zeros((S, nbs, 1), jnp.float32).at[:, 0].set(1.0)
    fm = first.reshape(S * nbs, 1)
    xbP = jnp.pad(xbs, [(0, 0), (0, pb), (0, 0)]).reshape(S * nbs, B)

    # (i, s) grid step reads the s-th source's i-th block chunk
    vecB = pl.BlockSpec((_CHUNK, B), lambda i, s: (s * nchb + i, 0),
                        memory_space=pltpu.VMEM)
    outS = pl.BlockSpec((_CHUNK, Fs), lambda i, s: (i, 0),
                        memory_space=pltpu.VMEM)
    col = lambda r: pl.BlockSpec((r, 1), lambda i, s: (s * nchb + i, 0),
                                 memory_space=pltpu.VMEM)
    rowblk = lambda n: pl.BlockSpec((R, n), lambda i, s: (s * nchb + i, 0),
                                    memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda i, s: (0, 0),
                                   memory_space=pltpu.VMEM)

    cj = [jnp.asarray(a) for a in (M1p, MBp, MAs, trig,
                                   fwr, fwi, ffr, ffi, ftr, fti)]
    outs = pl.pallas_call(
        partial(_assembly_mac_s_kernel, crossfade, n1, Gh, B, FLp, Fs,
                precision, _CHUNK, True, ff, 1),
        grid=(nchb, S),
        in_specs=[rowblk(taps_p), col(R), col(R), col(_CHUNK), vecB]
        + [const(a) for a in cj],
        out_specs=(outS, outS, outS, outS),
        out_shape=tuple(jax.ShapeDtypeStruct((nbs, Fs), jnp.float32)
                        for _ in range(4)),
        scratch_shapes=[pltpu.VMEM((2 * S, 2 * Fs), jnp.float32)],
        interpret=interpret,
    )(hR, dR, gR, fm, xbP, *cj)
    y0r, y0i, y1r, y1i = outs
    Ysr = jnp.stack([y0r[:nb], y1r[:nb]], axis=1)  # (nb, 2, Fs)
    Ysi = jnp.stack([y0i[:nb], y1i[:nb]], axis=1)
    return Ysr, Ysi

# ===================== single-launch block render kernel =====================
#
# The full BASELINE.json:5 north star in ONE pallas_call: raw time blocks
# and gathered (h, d, g) in, overlap-added stereo samples out. Composes the
# two fused-kernel cores back to back in VMEM — the (nb, 2, Fs) block
# spectra never exist in HBM at all (the two-kernel pipeline wrote/read
# ~75 MB of planes per headline call). Scene mode runs the mixdown in a
# VMEM plane accumulator: grid (nb/chunk, S), sources iterate fastest, and
# the inverse+OLA fires on each tile's LAST source iteration.

_RENDER_CHUNK = 32


def block_render_vmem_bytes(taps: int, n_fft: int, B: int,
                            n_sources: int, chunk: int | None = None) -> int:
    """VMEM estimate of the single-launch render kernel (both cores'
    constants + working sets at ``chunk`` — pass the SAME chunk the
    launch will use (default _RENDER_CHUNK) so the gate prices the real
    working set — the plane accumulator, the per-source filter carries,
    and the OLA tail carry). Pure shape arithmetic — never materialises
    the matrices."""
    L, FL, FLp, T_pad, Tp_p, Fn, Fnp, taps_p = _assembly_dims(taps, n_fft)
    n1 = n_fft // 128
    Fs = (n1 // 2 + 1) * 128
    ch = chunk if chunk is not None else _RENDER_CHUNK
    ma_sz = 0 if use_filter_fft(taps, n_fft) else Tp_p * 2 * Fs
    mats = (taps_p * 2 * FLp + 2 * FLp * Tp_p + ma_sz + 8 * FLp)
    consts = mats * 4 + (8 * 128 * 128 + 4 * max(n1, 8) * 128) * 4
    work = ch * (taps_p * 2 + 4 * FLp * 2 + Tp_p * 2 + 2 * 2 * Fs
                 + n_fft + 4 * n1 * 128 + 4 * (n1 // 2 + 1) * 128
                 + 8 * Fs + 4 * Fs            # spectra core
                 + 8 * Fs + 4 * n1 * 128 + 2 * n_fft + 2 * B) * 4  # inverse
    scr = (4 * ch * Fs + 2 * max(n_sources, 4) * 2 * Fs + 2 * 8 * n_fft) * 4
    return consts + work + scr


def _block_render_kernel(crossfade: bool, n1: int, Gh: int, B: int,
                         k_ola: int, FLp: int, Fs: int, precision,
                         chunk: int, S: int, gtab, dir_rate: int,
                         filter_fft: bool,
                         r1, r2, r3, first_ref, xb_ref,
                         m1_ref, mb_ref, ma_ref, trig_ref,
                         fwr, fwi, ffr, ffi, ftr, fti,
                         iwr, iwi, ifr, ifi, itr, iti,
                         *rest):
    """One grid step = `chunk` blocks of source s: (optional in-kernel
    HRTF gather) → spectra core → accumulate into the VMEM plane scratch
    → (last source) inverse+OLA.

    ``gtab`` = None: r1/r2/r3 are gathered (h, d, g) row refs. Otherwise
    gtab = (taps_p, apply_itd, apply_ild): r1/r2 are the per-block
    neighbor index/weight cols, r3 the VMEM-resident padded HRIR table,
    and `rest` leads with the delay/gain table. With ``dir_rate`` = k > 1
    the filter refs carry only the chunk/k unique directions."""
    cu = chunk // dir_rate
    if gtab is not None:
        taps_p, itd, ild = gtab
        dg_ref, *rest = rest
        h, d, g = _vmem_gather(_kdot(precision), r1, r2, r3, dg_ref,
                               cu, taps_p, itd, ild)
    else:
        h, d, g = r1[...], r2[...], r3[...]
    out0, out1, hcar, a0r, a0i, a1r, a1i, oc0, oc1 = rest
    s = pl.program_id(1)
    outs = _block_spectra_core(
        crossfade, n1, Gh, B, FLp, Fs, precision, chunk, 2 * s,
        h, d, g, first_ref, xb_ref,
        m1_ref, mb_ref, ma_ref, trig_ref,
        fwr, fwi, ffr, ffi, ftr, fti, hcar, dir_rate=dir_rate,
        filter_fft=filter_fft)
    (y0r, y0i), (y1r, y1i) = outs
    accs = (a0r, a0i, a1r, a1i)
    vals = (y0r, y0i, y1r, y1i)

    @pl.when(s == 0)
    def _():
        for a, v in zip(accs, vals):
            a[...] = v

    @pl.when(s != 0)
    def _():
        for a, v in zip(accs, vals):
            a[...] = a[...] + v

    init = pl.program_id(0) == 0  # hoisted: program_id is unavailable
                                  # inside a nested pl.when in interpret

    @pl.when(s == S - 1)
    def _():
        _inverse_ola_core(
            n1, Gh, B, k_ola, chunk, _kdot(precision),
            (a0r[...], a0i[...], a1r[...], a1i[...]), None,
            iwr, iwi, ifr, ifi, itr, iti,
            out0, out1, oc0, oc1, init)


@partial(jax.jit,
         static_argnames=("taps", "n_fft", "crossfade", "interpret",
                          "precision", "apply_itd", "apply_ild", "chunk",
                          "dir_rate"))
def fused_block_render(h, d, g, xbs: jax.Array,
                       taps: int, n_fft: int, crossfade: bool = True,
                       interpret: bool = False,
                       precision=jax.lax.Precision.HIGHEST,
                       idx=None, w=None, ht=None, dg=None,
                       apply_itd: bool = True, apply_ild: bool = True,
                       chunk: int | None = None, dir_rate: int = 1):
    """Single-launch render: raw blocks in, overlap-added stereo out.

    Two input modes: pre-gathered filters — h: (S, nb, 2, taps); d, g:
    (S, nb, 2) — or in-kernel gather (pass h = d = g = None and idx, w:
    (S, nb, 4) flat neighbor rows/weights + ht, dg: the padded VMEM
    tables from `gather_tables`). xbs: (S, nb, B) → (2, out) with
    out = (nb−1)·B + n_fft, sources mixed down (S = 1 is the plain
    trajectory render). The final OLA tails flush through k−1 appended
    silent blocks.

    ``dir_rate`` = k > 1: the caller's directions are snapped to every
    k-th block (RenderConfig.dir_rate semantics — caller must pass the
    SNAPPED h/d/g/idx/w; this wrapper slices rows [::k]) and the kernel
    gathers + assembles only the chunk/k unique filters per grid step,
    expanding each to its k blocks before the MAC. Exactly the same
    linear map as dir_rate=1 on the snapped track. Requires k | chunk
    and (gather mode) chunk/k ≥ 8.
    """
    S, nb, B = xbs.shape
    n1, Gh, Fs, k_ola = _epilogue_dims(n_fft, B)
    M1p, MBp, MAs, trig, dims = _scrambled_assembly_mats(taps, n_fft)
    L, FL, FLp, T_pad, Tp_p, Fn, Fnp, taps_p = dims
    ff = use_filter_fft(taps, n_fft)  # ff → MAs is the (8, 128) stub
    fwr, fwi, ffr, ffi, ftr, fti = _forward_fft_consts(n_fft)
    iwr, iwi, ifr, ifi, itr, iti = _epilogue_consts(n_fft)
    gtab = None if idx is None else (taps_p, apply_itd, apply_ild)
    if gtab is not None and ht.shape[0] > _GATHER_MAX_ROWS:
        raise ValueError(
            f"in-kernel gather table has {ht.shape[0]} rows; max is "
            f"{_GATHER_MAX_ROWS} — pass pre-gathered (h, d, g) instead")

    nb2 = nb + k_ola - 1  # flush rows
    ch = chunk if chunk is not None else _RENDER_CHUNK
    k = dir_rate
    if ch % k or (gtab is not None and ch // k < _F32_TILE_ROWS):
        raise ValueError(f"dir_rate {k} incompatible with chunk {ch}")
    cu = ch // k
    nbs = _round_up(nb2, ch)
    pb = nbs - nb
    nchb = nbs // ch
    R = 2 * cu

    def rows(z, lanes):  # (S, nb, 2, lanes) → chunk-major (2·S·nbs/k, lanes)
        z = jnp.pad(z, [(0, 0), (0, pb)] + [(0, 0)] * (z.ndim - 2))
        if k > 1:
            z = z[:, ::k]
        z = z.reshape(S * nchb, cu, 2, -1).transpose(0, 2, 1, 3)
        return z.reshape(2 * S * (nbs // k), lanes)

    first = jnp.zeros((S, nbs, 1), jnp.float32).at[:, 0].set(1.0)
    fm = first.reshape(S * nbs, 1)
    xbP = jnp.pad(xbs, [(0, 0), (0, pb), (0, 0)]).reshape(S * nbs, B)

    vecB = pl.BlockSpec((ch, B), lambda i, s: (s * nchb + i, 0),
                        memory_space=pltpu.VMEM)
    outB = pl.BlockSpec((ch, B), lambda i, s: (i, 0),
                        memory_space=pltpu.VMEM)
    col = lambda r, n=1: pl.BlockSpec((r, n), lambda i, s: (s * nchb + i, 0),
                                      memory_space=pltpu.VMEM)
    rowblk = lambda n: pl.BlockSpec((R, n), lambda i, s: (s * nchb + i, 0),
                                    memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda i, s: (0, 0),
                                   memory_space=pltpu.VMEM)

    cj = [jnp.asarray(a) for a in (M1p, MBp, MAs, trig,
                                   fwr, fwi, ffr, ffi, ftr, fti,
                                   iwr, iwi, ifr, ifi, itr, iti)]
    if gtab is None:
        hR = rows(jnp.pad(h, [(0, 0), (0, 0), (0, 0), (0, taps_p - taps)]),
                  taps_p)
        dR = rows(d[..., None], 1)
        gR = rows(g[..., None], 1)
        lead = [hR, dR, gR]
        lead_specs = [rowblk(taps_p), col(R), col(R)]
        tail, tail_specs = [], []
    else:
        def pad8(z):  # (S, nb, 4) → (S·nbs/k, 8) unique rows
            z = jnp.pad(z, [(0, 0), (0, pb), (0, 4)])
            if k > 1:
                z = z[:, ::k]
            return z.reshape(S * (nbs // k), 8)

        lead = [pad8(idx), pad8(w), ht]
        lead_specs = [col(cu, 8), col(cu, 8), const(ht)]
        tail, tail_specs = [dg], [const(dg)]
    y0, y1 = pl.pallas_call(
        partial(_block_render_kernel, crossfade, n1, Gh, B, k_ola, FLp,
                Fs, precision, ch, S, gtab, k, ff),
        grid=(nchb, S),
        in_specs=lead_specs + [col(ch), vecB]
        + [const(a) for a in cj] + tail_specs,
        out_specs=(outB, outB),
        out_shape=(jax.ShapeDtypeStruct((nbs, B), jnp.float32),
                   jax.ShapeDtypeStruct((nbs, B), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((2 * max(S, 4), 2 * Fs), jnp.float32),  # Hp carries
            pltpu.VMEM((ch, Fs), jnp.float32),  # plane accumulator ×4
            pltpu.VMEM((ch, Fs), jnp.float32),
            pltpu.VMEM((ch, Fs), jnp.float32),
            pltpu.VMEM((ch, Fs), jnp.float32),
            pltpu.VMEM((8, n_fft), jnp.float32),  # OLA tail carries
            pltpu.VMEM((8, n_fft), jnp.float32),
        ],
        interpret=interpret,
    )(*lead, fm, xbP, *cj, *tail)
    return jnp.stack([y0[:nb2].reshape(-1), y1[:nb2].reshape(-1)], axis=0)


def gather_tables(h: jax.Array, delays: jax.Array, gains: jax.Array,
                  taps: int, n_fft: int):
    """Pad the HRIR table into the in-kernel gather's VMEM layout.

    h: (E, A, 2, taps); delays, gains: (E, A, 2) → (ht (rows_p, 2·taps_p)
    [ear0 | ear1] lane-aligned, dg (rows_p, 128) cols [d0, d1, g0, g1]).
    """
    taps_p = _assembly_dims(taps, n_fft)[7]
    E, A = h.shape[0], h.shape[1]
    rows = E * A
    rows_p = _round_up(rows, 128)
    # The in-kernel gather selects rows by float-equality against an iota
    # over rows_p and keeps the whole table VMEM-resident; enforce the
    # bound HERE (the public surface) rather than trusting the renderer's
    # call-site gate (round-3 advisor finding).
    if rows_p > _GATHER_MAX_ROWS:
        raise ValueError(
            f"HRIR table has {rows} directions (padded {rows_p}); the "
            f"in-kernel gather supports at most {_GATHER_MAX_ROWS} padded "
            f"rows — use the XLA gather path (pass h, d, g) instead")
    hf = h.reshape(rows, 2, taps)
    ear = lambda e: jnp.pad(hf[:, e], [(0, rows_p - rows),
                                       (0, taps_p - taps)])
    ht = jnp.concatenate([ear(0), ear(1)], axis=1)
    dgc = jnp.zeros((rows_p, 128), jnp.float32)
    dgc = dgc.at[:rows, 0:2].set(delays.reshape(rows, 2))
    dgc = dgc.at[:rows, 2:4].set(gains.reshape(rows, 2))
    return ht, dgc


# ==================== fused batched partitioned-conv kernel ==================
#
# The offline partitioned renderer (BASELINE.json:10 "batched partitioned
# convolution"; the BRIR/long-filter path) ran as ~8 XLA stages per call:
# frame rffts, the materialised (P, nb, F) frequency-domain delay line, the
# per-partition MAC einsum, crossfade-pair inverse FFTs, tail slicing and
# blending. This kernel runs the whole post-assembly pipeline in VMEM per
# chunk of blocks — the same four-step FFT machinery as the block kernels,
# at frame size 2B:
#
#   xb ──[prev-row carry]──▶ overlap-save frames ──fwd four-step──▶ X
#   X ──row-shift delay line (P−1 carried rows)──▶ Σ_p X[b−p]·H_p[b]
#   (crossfade pair vs H[b−1] via one carried H row) ──inverse four-step──▶
#   last-B tails ──ramp blend──▶ (2, nb·B)
#
# Filter assembly stays in XLA (the partition zoom matmuls or the fft
# chain — long-BRIR matrices overflow VMEM; see `_partitioned_scan`), and
# the assembled partitions are gathered once into the scrambled-half
# layout, so the kernel's MAC and inverse read them directly.


def partitioned_step_vmem_bytes(B: int, P: int) -> int:
    """VMEM estimate (constants + per-grid-step working set + carries) of
    the fused partitioned kernel, for the eligibility gate."""
    n1p = (2 * B) // 128
    Fs2 = (n1p // 2 + 1) * 128
    ch = _PART_CHUNK
    consts = (8 * 128 * 128 + 4 * max(n1p, 8) * 128) * 4
    work = ch * (2 * B * 3 + 4 * n1p * 128 + 6 * Fs2  # frames + fft + X
                 + 4 * P * 2 * Fs2                     # H rows ×2 (c, prev)
                 + 16 * Fs2 + 4 * 2 * B + 2 * B) * 4   # MAC/inv/out
    carries = (8 * B + max(8, P - 1) * 2 * Fs2 + 2 * 8 * P * 2 * Fs2) * 4
    return consts + work + carries


_PART_CHUNK = 32  # blocks per grid step of the partitioned kernel


def _partitioned_conv_core(crossfade: bool, n1p: int, Ghp: int, B: int,
                           P: int, dot, chunk: int,
                           x, Hr, Hi, fm,
                           fwr, fwi, ftr, fti,
                           iwr, iwi, ifr, ifi, itr, iti,
                           y0_o, y1_o, xcar, dcar, hrcar, hicar):
    """Shared post-filter body of the partitioned kernels: overlap-save
    frames (carried), forward four-step at 2B, the P-partition
    frequency-domain delay-line MAC under the given (chunk, P·2·Fs2)
    filter rows, the crossfade pair, and the ear-packed inverse tails.
    Callers differ only in where Hr/Hi come from (precomputed rows vs
    the in-kernel assembly)."""
    Fs2 = Ghp * 128

    @pl.when(pl.program_id(0) == 0)
    def _():
        xcar[...] = jnp.zeros_like(xcar)
        dcar[...] = jnp.zeros_like(dcar)
        hrcar[...] = jnp.zeros_like(hrcar)
        hicar[...] = jnp.zeros_like(hicar)

    # ---- overlap-save frames via the previous-row carry
    xprev = jnp.concatenate([xcar[0:1], x[:-1]], axis=0)
    xcar[0:1] = x[-1:]
    frame = jnp.concatenate([xprev, x], axis=1)  # (chunk, 2B)

    # ---- forward four-step at n = 2B (real input)
    zeros = jnp.zeros((chunk, 128), jnp.float32)
    gl = [(frame[:, i * 128:(i + 1) * 128], zeros) for i in range(n1p)]
    S1 = _tile_fft(gl, n1p, -1.0)
    T_r, T_i = [], []
    for kk in range(n1p):
        ar, ai = S1[kk]
        tr, ti = ftr[kk:kk + 1, :], fti[kk:kk + 1, :]
        T_r.append(ar * tr - ai * ti)
        T_i.append(ar * ti + ai * tr)
    Ar = jnp.concatenate(T_r[:Ghp], axis=0)
    Ai = jnp.concatenate(T_i[:Ghp], axis=0)
    W, Wi_ = fwr[...], fwi[...]
    Zr = dot(Ar, W) - dot(Ai, Wi_)
    Zi = dot(Ar, Wi_) + dot(Ai, W)
    lanes = lambda Z: jnp.concatenate(
        [Z[kk * chunk:(kk + 1) * chunk] for kk in range(Ghp)], axis=1)
    X = jnp.concatenate([lanes(Zr), lanes(Zi)], axis=1)  # (chunk, 2Fs2)

    # ---- frequency-domain delay line: row shifts with carried history
    km = P - 1
    ztot = jnp.concatenate([dcar[0:km], X], axis=0) if km else X
    if km:
        dcar[0:km] = ztot[chunk:chunk + km]

    # ---- per-block filter partitions (+ previous-block row for crossfade)
    if crossfade:
        Hpr = jnp.where(fm > 0.5, Hr,
                        jnp.concatenate([hrcar[0:1], Hr[:-1]], axis=0))
        Hpi = jnp.where(fm > 0.5, Hi,
                        jnp.concatenate([hicar[0:1], Hi[:-1]], axis=0))
        hrcar[0:1] = Hr[-1:]
        hicar[0:1] = Hi[-1:]

    def mac(HR, HI):  # Σ_p X[b−p]·H_p → (chunk, Fs2) re/im per ear
        acc = [[None, None], [None, None]]
        for p in range(P):
            Xs = ztot[km - p:km - p + chunk] if km else X
            xr, xi = Xs[:, :Fs2], Xs[:, Fs2:]
            for ear in range(2):
                s = slice((p * 2 + ear) * Fs2, (p * 2 + ear + 1) * Fs2)
                hr, hi = HR[:, s], HI[:, s]
                tr = xr * hr - xi * hi
                ti = xr * hi + xi * hr
                acc[ear][0] = tr if acc[ear][0] is None else acc[ear][0] + tr
                acc[ear][1] = ti if acc[ear][1] is None else acc[ear][1] + ti
        return acc

    def inverse_tail(Y):  # ear-packed inverse four-step → (chunk, B) ×2
        (y0r, y0i), (y1r, y1i) = Y
        zyr, zyi = y0r - y1i, y0i + y1r
        ztr, zti = y0r + y1i, y1r - y0i
        g = lambda z, gi: z[:, gi * 128:(gi + 1) * 128]
        Br = jnp.concatenate([g(zyr, gi) for gi in range(Ghp)], axis=0)
        Bi = jnp.concatenate([g(zyi, gi) for gi in range(Ghp)], axis=0)
        Wv, Wvi = iwr[...], iwi[...]
        F1a_r = dot(Br, Wv) - dot(Bi, Wvi)
        F1a_i = dot(Br, Wvi) + dot(Bi, Wv)
        if Ghp < n1p:  # no mirror groups at n1p ≤ 2 (see _asm_filters)
            Mr = jnp.concatenate([g(ztr, n1p - gi)
                                  for gi in range(Ghp, n1p)], axis=0)
            Mi = jnp.concatenate([g(zti, n1p - gi)
                                  for gi in range(Ghp, n1p)], axis=0)
            Wf, Wfi_ = ifr[...], ifi[...]
            F1b_r = dot(Mr, Wf) - dot(Mi, Wfi_)
            F1b_i = dot(Mr, Wfi_) + dot(Mi, Wf)
        F2 = []
        for gi in range(n1p):
            if gi < Ghp:
                fr = F1a_r[gi * chunk:(gi + 1) * chunk]
                fi = F1a_i[gi * chunk:(gi + 1) * chunk]
            else:
                j = gi - Ghp
                fr = F1b_r[j * chunk:(j + 1) * chunk]
                fi = F1b_i[j * chunk:(j + 1) * chunk]
            tr, ti = itr[gi:gi + 1, :], iti[gi:gi + 1, :]
            F2.append((fr * tr - fi * ti, fr * ti + fi * tr))
        zg = _tile_fft(F2, n1p, +1.0)
        z_r = jnp.concatenate([t[0] for t in zg], axis=1)  # (chunk, 2B)
        z_i = jnp.concatenate([t[1] for t in zg], axis=1)
        return z_r[:, B:], z_i[:, B:]  # overlap-save tails

    Yn = mac(Hr, Hi)
    yn0, yn1 = inverse_tail(Yn)
    if crossfade:
        Yp = mac(Hpr, Hpi)
        yp0, yp1 = inverse_tail(Yp)
        ramp = ((jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
                 .astype(jnp.float32) + 0.5) / B)
        y0_o[...] = ramp * yn0 + (1.0 - ramp) * yp0
        y1_o[...] = ramp * yn1 + (1.0 - ramp) * yp1
    else:
        y0_o[...] = yn0
        y1_o[...] = yn1


def _partitioned_kernel(crossfade: bool, n1p: int, Ghp: int, B: int, P: int,
                        precision, chunk: int,
                        xb_ref, hr_ref, hi_ref, first_ref,
                        fwr, fwi, ftr, fti,
                        iwr, iwi, ifr, ifi, itr, iti,
                        y0_o, y1_o, xcar, dcar, hrcar, hicar):
    """One grid step = `chunk` blocks of the batched partitioned conv
    with PRE-ASSEMBLED filter rows."""
    _partitioned_conv_core(
        crossfade, n1p, Ghp, B, P, _kdot(precision), chunk,
        xb_ref[...], hr_ref[...], hi_ref[...],
        first_ref[...] if crossfade else None,
        fwr, fwi, ftr, fti, iwr, iwi, ifr, ifi, itr, iti,
        y0_o, y1_o, xcar, dcar, hrcar, hicar)


@partial(jax.jit,
         static_argnames=("B", "P", "crossfade", "interpret", "precision",
                          "chunk"))
def fused_partitioned_step(xb: jax.Array, Hr: jax.Array, Hi: jax.Array,
                           first: jax.Array, B: int, P: int,
                           crossfade: bool = True, interpret: bool = False,
                           precision=jax.lax.Precision.HIGHEST,
                           chunk: int | None = None):
    """Batched partitioned convolution (post-assembly) in one launch.

    xb: (nb, B) raw blocks; Hr, Hi: (nb, P·2·Fs2) f32 planes of the
    per-block filter partitions in the scrambled-half layout of
    `_scramble_maps(2B)`, lanes [partition][ear][bin]; first: (nb,).
    → (2, nb·B) — the streaming renderer's exact output, batched.
    ``chunk`` overrides the per-grid-step block tile (profiling /
    tuning; None = the measured default).
    """
    nb = xb.shape[0]
    n1p = (2 * B) // 128
    Ghp = n1p // 2 + 1
    Fs2 = Ghp * 128
    first = first.at[0].set(1.0)
    fwr, fwi, ffr_, ffi_, ftr, fti = _forward_fft_consts(2 * B)
    iwr, iwi, ifr, ifi, itr, iti = _epilogue_consts(2 * B)

    ch = chunk if chunk is not None else _PART_CHUNK
    nbp = _round_up(max(nb, 1), ch)
    pb = nbp - nb
    pad = lambda z: jnp.pad(z, [(0, pb)] + [(0, 0)] * (z.ndim - 1))
    fm = jnp.pad(first.astype(jnp.float32), [(0, pb)],
                 constant_values=1.0)[..., None]

    rowb = lambda n: pl.BlockSpec((ch, n), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    cj = [jnp.asarray(a) for a in (fwr, fwi, ftr, fti,
                                   iwr, iwi, ifr, ifi, itr, iti)]
    y0, y1 = pl.pallas_call(
        partial(_partitioned_kernel, crossfade, n1p, Ghp, B, P,
                precision, ch),
        grid=(nbp // ch,),
        in_specs=[rowb(B), rowb(P * 2 * Fs2), rowb(P * 2 * Fs2), rowb(1)]
        + [const(a) for a in cj],
        out_specs=(rowb(B), rowb(B)),
        out_shape=(jax.ShapeDtypeStruct((nbp, B), jnp.float32),
                   jax.ShapeDtypeStruct((nbp, B), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((8, B), jnp.float32),
                        pltpu.VMEM((max(8, P - 1), 2 * Fs2), jnp.float32),
                        pltpu.VMEM((8, P * 2 * Fs2), jnp.float32),
                        pltpu.VMEM((8, P * 2 * Fs2), jnp.float32)],
        interpret=interpret,
    )(pad(xb), pad(Hr), pad(Hi), fm, *cj)
    return jnp.stack([y0[:nb].reshape(-1), y1[:nb].reshape(-1)], axis=0)


# ---------------- in-kernel BRIR filter assembly (round 4) -----------------
#
# The packed-FFT round-4 work left the XLA-side assembly (effective-filter
# irfft_L + P segment rffts + scramble) at ~14× the partitioned kernel's
# own time at the 2048-tap bench shape. This stage moves all of it in
# kernel: the ramped L-spectrum planes ride in (scrambled-half layout,
# one per ear), the kernel runs the ear-packed inverse four-step at L,
# masks the effective-filter truncation in time, and emits each
# partition's 2B spectra through an ear-packed forward four-step with
# the Hermitian mirror tile — exactly the Hr/Hi rows the conv core MACs.
# Layout algebra validated to 1e-14 against numpy.fft BEFORE this
# implementation: scripts/derive_partitioned_inkernel_assembly.py.


def _asm_filters(dot, chunk: int, P: int, B: int, n1p: int, Ghp: int,
                 n1L: int, GhL: int, T_pad: int,
                 ar, ai, br, bi,
                 fwr, fwi, ftr, fti, fmr, fmi,
                 lwr, lwi, lfr, lfi, ltr, lti):
    """In-kernel filter assembly → (Hr, Hi) (chunk, P·2·Fs2).

    ar/ai, br/bi: (chunk, GhL·128) scrambled-half planes of the two
    ears' ramped L-spectra (rfft_L(h)·ramp·gain). Consts: forward at 2B
    (incl. the mirror pair fmr/fmi) and inverse at L.
    """
    # ear-pack + inverse four-step at L (same algebra as
    # _inverse_ola_core; no OLA — the result is the effective filter)
    zyr, zyi = ar - bi, ai + br
    ztr, zti = ar + bi, br - ai
    g = lambda z, gi: z[:, gi * 128:(gi + 1) * 128]
    Dr = jnp.concatenate([g(zyr, gi) for gi in range(GhL)], axis=0)
    Di = jnp.concatenate([g(zyi, gi) for gi in range(GhL)], axis=0)
    W, Wi_ = lwr[...], lwi[...]
    F1a_r = dot(Dr, W) - dot(Di, Wi_)
    F1a_i = dot(Dr, Wi_) + dot(Di, W)
    if GhL < n1L:  # reconstruct the Hermitian mirror groups (none exist
        # at n1L ≤ 2 — the stored half IS the whole spectrum there, and
        # the gi ≥ GhL branch below never fires)
        Mr = jnp.concatenate([g(ztr, n1L - gi) for gi in range(GhL, n1L)],
                             axis=0)
        Mi = jnp.concatenate([g(zti, n1L - gi) for gi in range(GhL, n1L)],
                             axis=0)
        Wf, Wfi_ = lfr[...], lfi[...]
        F1b_r = dot(Mr, Wf) - dot(Mi, Wfi_)
        F1b_i = dot(Mr, Wfi_) + dot(Mi, Wf)
    F2 = []
    for gi in range(n1L):
        if gi < GhL:
            fr = F1a_r[gi * chunk:(gi + 1) * chunk]
            fi = F1a_i[gi * chunk:(gi + 1) * chunk]
        else:
            j = gi - GhL
            fr = F1b_r[j * chunk:(j + 1) * chunk]
            fi = F1b_i[j * chunk:(j + 1) * chunk]
        tr, ti = ltr[gi:gi + 1, :], lti[gi:gi + 1, :]
        F2.append((fr * tr - fi * ti, fr * ti + fi * tr))
    zg = _tile_fft(F2, n1L, +1.0)  # time tiles: t = i1·128 + i2 (packed)

    # per-partition ear-packed forward at 2B with the Hermitian mirror,
    # truncation mask folded into the group list (group tiles past T_pad
    # are dropped, the boundary tile lane-masked — the effective_filter
    # [:T_pad] truncation)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    nseg_g = B // 128
    W2, W2i = fwr[...], fwi[...]
    Wm, Wmi = fmr[...], fmi[...]
    lanes = lambda Z: jnp.concatenate(
        [Z[kk * chunk:(kk + 1) * chunk] for kk in range(Ghp)], axis=1)
    Hr_parts, Hi_parts = [], []
    for p in range(P):
        gl = []
        for j in range(n1p):
            i1 = p * nseg_g + j
            if j >= nseg_g or i1 * 128 >= T_pad:
                gl.append(None)  # zero-pad half / fully-truncated tile
                continue
            xr_t, xi_t = zg[i1]
            if (i1 + 1) * 128 > T_pad:
                m = (lane < (T_pad - i1 * 128)).astype(jnp.float32)
                xr_t, xi_t = xr_t * m, xi_t * m
            gl.append((xr_t, xi_t))
        S1 = _tile_fft(gl, n1p, -1.0)
        T_r, T_i = [], []
        for kk in range(n1p):
            sr, si = S1[kk]
            tr, ti = ftr[kk:kk + 1, :], fti[kk:kk + 1, :]
            T_r.append(sr * tr - si * ti)
            T_i.append(sr * ti + si * tr)
        Ar_ = jnp.concatenate(T_r[:Ghp], axis=0)
        Ai_ = jnp.concatenate(T_i[:Ghp], axis=0)
        Zf_r = dot(Ar_, W2) - dot(Ai_, W2i)
        Zf_i = dot(Ar_, W2i) + dot(Ai_, W2)
        # mirror tile C = conj(Z[−k]) — same construction as
        # _forward_fourstep's need_mirror branch
        U0_r = dot(T_r[0], W2) + dot(T_i[0], W2i)
        U0_i = -dot(T_r[0], W2i) + dot(T_i[0], W2)
        Br_ = jnp.concatenate([T_r[n1p - kk] for kk in range(1, Ghp)],
                              axis=0)
        Bi_ = jnp.concatenate([T_i[n1p - kk] for kk in range(1, Ghp)],
                              axis=0)
        Um_r = dot(Br_, Wm) - dot(Bi_, Wmi)
        Um_i = dot(Br_, Wmi) + dot(Bi_, Wm)
        C_r = jnp.concatenate([U0_r, Um_r], axis=0)
        C_i = -jnp.concatenate([U0_i, Um_i], axis=0)
        # unpack ears in the lane-concat layout:
        # H0 = (Zf + C)/2, H1 = (Zf − C)/(2j)
        Zfr_l, Zfi_l = lanes(Zf_r), lanes(Zf_i)
        Cr_l, Ci_l = lanes(C_r), lanes(C_i)
        Hr_parts += [0.5 * (Zfr_l + Cr_l), 0.5 * (Zfi_l - Ci_l)]
        Hi_parts += [0.5 * (Zfi_l + Ci_l), -0.5 * (Zfr_l - Cr_l)]
    return (jnp.concatenate(Hr_parts, axis=1),
            jnp.concatenate(Hi_parts, axis=1))


@lru_cache(maxsize=8)
def _ramp_trig_scrambled(L: int) -> np.ndarray:
    """`_ramp_trig_table` folded onto the scrambled-half lanes of L:
    rows [θ, sin θ, cos θ, taper w] evaluated at the lane's folded bin
    (`_scramble_maps` idx), plus row 4 = the mirror conj sign (flips the
    ramp's sine on lanes that store conjugated bins)."""
    n1 = L // 128
    FsL = (n1 // 2 + 1) * 128
    FLp = _round_up(L // 2 + 1, 128)
    nat = _ramp_trig_table(L, FLp)
    idx, sgn = _scramble_maps(L)
    out = np.zeros((8, FsL), np.float32)
    out[0:4] = nat[0:4][:, idx]
    out[4] = sgn
    return out


def _rows_to_planes(precision, chunk: int, n1L: int, GhL: int, taps_p: int,
                    h0, h1, d0, d1, g0, g1,
                    flwr, flwi, flmr, flmi, fltr, flti, trig_s):
    """In-kernel rfft_L(h)·delay_ramp·gain → the scrambled-half ramped
    planes `_asm_filters` consumes. h0, h1: (chunk, taps_p) ear rows
    (ear-packed into ONE `_forward_fourstep` at L, unpacked via the
    mirror tile); d0/d1, g0/g1: (chunk, 1) per-ear delay/gain columns;
    trig_s: the `_ramp_trig_scrambled(L)` constant."""
    Zf_r, Zf_i, C_r, C_i = _forward_fourstep(
        h0, h1, n1L, GhL, chunk, flwr, flwi, flmr, flmi, fltr, flti,
        precision, need_mirror=True)
    lanesL = lambda Z: jnp.concatenate(
        [Z[kk * chunk:(kk + 1) * chunk] for kk in range(GhL)], axis=1)
    Zfr_l, Zfi_l = lanesL(Zf_r), lanesL(Zf_i)
    Cr_l, Ci_l = lanesL(C_r), lanesL(C_i)
    A_r, A_i = 0.5 * (Zfr_l + Cr_l), 0.5 * (Zfi_l + Ci_l)   # ear-0 rfft_L
    B_r, B_i = 0.5 * (Zfi_l - Ci_l), -0.5 * (Zfr_l - Cr_l)  # ear-1
    # per-ear delay ramp (folded bins; sign row conjugates mirror lanes)
    # + gain
    sgn = trig_s[4:5, :]
    c0, s0 = _ramp_cos_sin(d0, trig_s)
    c1, s1 = _ramp_cos_sin(d1, trig_s)
    s0, s1 = s0 * sgn, s1 * sgn
    ar = (A_r * c0 - A_i * s0) * g0
    ai = (A_r * s0 + A_i * c0) * g0
    br = (B_r * c1 - B_i * s1) * g1
    bi = (B_r * s1 + B_i * c1) * g1
    return ar, ai, br, bi


def _partitioned_asm_kernel(crossfade: bool, n1p: int, Ghp: int, B: int,
                            P: int, precision, chunk: int, dir_rate: int,
                            n1L: int, GhL: int, T_pad: int, taps_p: int,
                            xb_ref, h0_ref, h1_ref, dg_ref, first_ref,
                            fwr, fwi, ftr, fti, fmr, fmi,
                            iwr, iwi, ifr, ifi, itr, iti,
                            lwr, lwi, lfr, lfi, ltr, lti,
                            flwr, flwi, flmr, flmi, fltr, flti, trig_s,
                            y0_o, y1_o, xcar, dcar, hrcar, hicar):
    """One grid step = `chunk` blocks: in-kernel filter assembly straight
    from the (h, d, g) rows, then the shared partitioned conv body.

    ``dir_rate`` = k > 1 (RenderConfig.dir_rate on SNAPPED direction
    tracks): the h/d/g refs carry only the chunk/k UNIQUE rows, the
    whole assembly chain runs at chunk/k, and the assembled H rows are
    expanded k× by sublane repeat (`_expand_rows`) before the conv body
    — whose own previous-row crossfade shift then behaves bit-exactly
    like dir_rate=1 on the snapped track (the defined semantics)."""
    dot = _kdot(precision)
    cu = chunk // dir_rate
    # d/g ride the dg vector — lanes extracted by masked reductions
    # (direct lane slices at offsets 1..3 hit the Mosaic "offset
    # mismatch on non-concat dimension" lowering bug)
    dgv = dg_ref[...]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    colv = lambda k: jnp.sum(jnp.where(lane == k, dgv, 0.0), axis=1,
                             keepdims=True)
    ar, ai, br, bi = _rows_to_planes(
        precision, cu, n1L, GhL, taps_p,
        h0_ref[...], h1_ref[...], colv(0), colv(1), colv(2), colv(3),
        flwr, flwi, flmr, flmi, fltr, flti, trig_s)
    Hr, Hi = _asm_filters(
        dot, cu, P, B, n1p, Ghp, n1L, GhL, T_pad,
        ar, ai, br, bi,
        fwr, fwi, ftr, fti, fmr, fmi, lwr, lwi, lfr, lfi, ltr, lti)
    Hr = _expand_rows(Hr, dir_rate, chunk, precision)
    Hi = _expand_rows(Hi, dir_rate, chunk, precision)
    _partitioned_conv_core(
        crossfade, n1p, Ghp, B, P, dot, chunk,
        xb_ref[...], Hr, Hi, first_ref[...] if crossfade else None,
        fwr, fwi, ftr, fti, iwr, iwi, ifr, ifi, itr, iti,
        y0_o, y1_o, xcar, dcar, hrcar, hicar)


def partitioned_asm_vmem_bytes(taps: int, B: int, P: int,
                               chunk: int | None = None,
                               dir_rate: int = 1) -> int:
    """VMEM estimate of the assembling partitioned kernel (constants +
    per-grid-step working set + carries), for the eligibility gate.
    ``dir_rate`` = k > 1 runs the assembly stage at chunk/k unique rows
    and adds the k×-expanded H rows the conv body consumes."""
    from ..ops.filters import DELAY_PAD, next_pow2

    T_pad = taps + DELAY_PAD
    L = next_pow2(T_pad)
    n1L = L // 128
    GhL = n1L // 2 + 1
    n1p = (2 * B) // 128
    Fs2 = (n1p // 2 + 1) * 128
    taps_p = _round_up(taps, 128)
    FsL = GhL * 128
    ch = chunk if chunk is not None else _PART_CHUNK
    cu = ch // max(dir_rate, 1)
    asm_rows = cu if dir_rate > 1 else ch
    consts = (8 * 128 * 128 + 4 * max(n1L, 8) * 128
              + 4 * max(n1p, 8) * 128 + 8 * FsL) * 4
    asm_work = asm_rows * (2 * taps_p + 128  # h rows + dg vector
                           + 8 * GhL * 128   # fwd-L tiles + unpacked ears
                           + 4 * GhL * 128   # ramped planes
                           + 4 * n1L * 128 * 2  # inverse F1 + F2/zg tiles
                           + 6 * Fs2 * 2     # per-seg fwd transients ×2
                           + 2 * P * 2 * Fs2) * 4  # assembled H rows
    expand = (ch * 2 * P * 2 * Fs2 * 4) if dir_rate > 1 else 0
    conv_work = ch * (2 * B * 3 + 4 * n1p * 128 + 6 * Fs2
                      + 2 * P * 2 * Fs2     # crossfade prev rows
                      + 16 * Fs2 + 4 * 2 * B + 2 * B) * 4
    carries = (8 * B + max(8, P - 1) * 2 * Fs2 + 2 * 8 * P * 2 * Fs2) * 4
    return consts + asm_work + expand + conv_work + carries


@partial(jax.jit,
         static_argnames=("taps", "B", "P", "crossfade", "interpret",
                          "precision", "chunk", "dir_rate"))
def fused_partitioned_assembled(xb: jax.Array, h: jax.Array,
                                d: jax.Array, g: jax.Array,
                                first: jax.Array,
                                taps: int, B: int, P: int,
                                crossfade: bool = True,
                                interpret: bool = False,
                                precision=jax.lax.Precision.HIGHEST,
                                chunk: int | None = None,
                                dir_rate: int = 1):
    """Batched partitioned convolution with IN-KERNEL filter assembly.

    xb: (nb, B) raw blocks; h: (nb/dir_rate, 2, taps) interpolated
    HRIR/BRIR shapes; d, g: (nb/dir_rate, 2) per-ear delays/gains;
    first: (nb,). → (2, nb·B) — identical output to
    `fused_partitioned_step` fed the XLA-assembled partitions (same
    linear map; derivation validated to 1e-14,
    scripts/derive_partitioned_inkernel_assembly.py). The whole
    assembly chain — rfft_L(h) (ear-packed four-step), the delay ramp
    (`_ramp_cos_sin` at folded bins) and gain, the inverse-L back to
    the effective filter, its truncation, and the P per-partition 2B
    transforms — runs in VMEM; XLA supplies only the gathered rows.

    ``dir_rate`` = k > 1 (round-5): callers pass SNAPPED direction
    tracks' UNIQUE group rows only (h/d/g at block indices 0, k, 2k, …)
    and the kernel assembles chunk/k filters per grid step, expanding
    them k× before the conv body — the partitioned-route analog of the
    block-render kernel's unique-filter fast path. Requires k | nb,
    k | chunk, and chunk/k ≥ 8 (f32 tile row minimum).
    """
    from ..ops.filters import DELAY_PAD, next_pow2

    nb = xb.shape[0]
    T_pad = taps + DELAY_PAD
    L = next_pow2(T_pad)
    n1L = L // 128
    GhL = n1L // 2 + 1
    n1p = (2 * B) // 128
    Ghp = n1p // 2 + 1
    Fs2 = Ghp * 128
    taps_p = _round_up(taps, 128)
    if P * B > L:
        raise ValueError(f"P·B = {P * B} exceeds L = {L}")
    first = first.at[0].set(1.0)
    fwr, fwi, fmr, fmi, ftr, fti = _forward_fft_consts(2 * B)
    iwr, iwi, ifr, ifi, itr, iti = _epilogue_consts(2 * B)
    lwr, lwi, lfr, lfi, ltr, lti = _epilogue_consts(L)
    flwr, flwi, flmr, flmi, fltr, flti = _forward_fft_consts(L)
    trig_s = _ramp_trig_scrambled(L)

    ch = chunk if chunk is not None else _PART_CHUNK
    k = dir_rate
    cu = ch // max(k, 1)
    if k > 1 and (nb % k or ch % k or cu % 8 or h.shape[0] != nb // k):
        raise ValueError(
            f"fused_partitioned_assembled: dir_rate={k} needs k | nb "
            f"({nb}), k | chunk ({ch}), chunk/k ≥ 8 and h rows = nb/k "
            f"(got {h.shape[0]})")
    nbp = _round_up(max(nb, 1), ch)
    pb = nbp - nb
    nb_u = nb // k
    pbu = nbp // k - nb_u
    pad = lambda z: jnp.pad(z, [(0, pb)] + [(0, 0)] * (z.ndim - 1))
    fm = jnp.pad(first.astype(jnp.float32), [(0, pb)],
                 constant_values=1.0)[..., None]
    hp = jnp.pad(h, [(0, pbu), (0, 0), (0, taps_p - taps)])
    dgv = jnp.zeros((nbp // k, 128), jnp.float32)
    dgv = dgv.at[:nb_u, 0:2].set(d)
    dgv = dgv.at[:nb_u, 2:4].set(g)

    rowb = lambda n: pl.BlockSpec((ch, n), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    rowu = lambda n: pl.BlockSpec((cu, n), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    cj = [jnp.asarray(a) for a in (fwr, fwi, ftr, fti, fmr, fmi,
                                   iwr, iwi, ifr, ifi, itr, iti,
                                   lwr, lwi, lfr, lfi, ltr, lti,
                                   flwr, flwi, flmr, flmi, fltr, flti,
                                   trig_s)]
    y0, y1 = pl.pallas_call(
        partial(_partitioned_asm_kernel, crossfade, n1p, Ghp, B, P,
                precision, ch, k, n1L, GhL, T_pad, taps_p),
        grid=(nbp // ch,),
        in_specs=[rowb(B), rowu(taps_p), rowu(taps_p), rowu(128), rowb(1)]
        + [const(a) for a in cj],
        out_specs=(rowb(B), rowb(B)),
        out_shape=(jax.ShapeDtypeStruct((nbp, B), jnp.float32),
                   jax.ShapeDtypeStruct((nbp, B), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((8, B), jnp.float32),
                        pltpu.VMEM((max(8, P - 1), 2 * Fs2), jnp.float32),
                        pltpu.VMEM((8, P * 2 * Fs2), jnp.float32),
                        pltpu.VMEM((8, P * 2 * Fs2), jnp.float32)],
        interpret=interpret,
    )(pad(xb), hp[:, 0], hp[:, 1], dgv, fm, *cj)
    return jnp.stack([y0[:nb].reshape(-1), y1[:nb].reshape(-1)], axis=0)


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
    DFTr, DI = _stream_frame_mats(block)
    dims = (L, FL, FLp, F2, F2p, P, taps_p)
    return M1p, M2p, trig, DFTr, DI, dims


@lru_cache(maxsize=8)
def _stream_frame_mats(block: int):
    """The streaming step's frame transforms (block-only constants,
    shared by the zoom and in-kernel-assembly variants): DFTr = rfft of
    the 2B overlap-save frame as a real matmul → [Re|Im] planes; DI =
    the last-B samples of irfft_2B from [Re|Im] planes."""
    F2 = block + 1
    F2p = _round_up(F2, 128)
    G = np.fft.rfft(np.eye(2 * block), axis=-1)  # (2B, F2)
    DFTr = np.zeros((2 * block, 2 * F2p), np.float32)
    DFTr[:, :F2] = G.real
    DFTr[:, F2p:F2p + F2] = G.imag
    basis = np.zeros((2 * F2p, F2), np.complex128)
    basis[:F2] = np.eye(F2)
    basis[F2p:F2p + F2] = 1j * np.eye(F2)
    DI = np.fft.irfft(basis, n=2 * block,
                      axis=-1)[:, block:].astype(np.float32)
    return DFTr, DI


def _stream_dims(taps: int, block: int):
    """`_stream_step_mats`' dims tuple WITHOUT materialising the zoom
    matrices (which cost minutes + ~100 MB at BRIR sizes)."""
    from .filters import DELAY_PAD, next_pow2

    T_pad = taps + DELAY_PAD
    L = next_pow2(T_pad)
    FL = L // 2 + 1
    F2 = block + 1
    return (L, FL, _round_up(FL, 128), F2, _round_up(F2, 128),
            -(-T_pad // block), _round_up(taps, 128))


@lru_cache(maxsize=8)
def _scram_to_nat(n_fft: int):
    """One-hot (Fs, F2p) matmul constants (Pm_re, Pm_im) mapping a
    scrambled-half plane back to natural bin order. Bins whose group
    index k mod n1 < Gh have a direct lane (stores H[k] as-is); the
    rest exist only on a mirror lane, which stores conj(H[k]) — same
    real part, negated imag — hence the signed imag matrix."""
    n1 = n_fft // 128
    Gh = n1 // 2 + 1
    F2 = n_fft // 2 + 1
    F2p = _round_up(F2, 128)
    Pr = np.zeros((Gh * 128, F2p), np.float32)
    Pi = np.zeros((Gh * 128, F2p), np.float32)
    for k in range(F2):
        k1 = k % n1
        if k1 < Gh:
            sb, s = k1 * 128 + k // n1, 1.0
        else:
            kk = n_fft - k
            sb, s = (kk % n1) * 128 + kk // n1, -1.0
        Pr[sb, k] = 1.0
        Pi[sb, k] = s
    return Pr, Pi


def _stream_conv_core(crossfade: bool, Sp: int, B: int, F2p: int, P: int,
                      dotp, prev_in, xb_ref, fdl_re, fdl_im, ph_ref,
                      started_ref, H, dft_ref, di_ref,
                      y_out, nf_re, nf_im, nh_out):
    """Shared post-assembly body of the streaming kernels: overlap-save
    frame → rfft matmul → FDL shift → P-partition MAC under the given
    (2Sp, P·2F2p) filter rows → crossfade pair → irfft-tail matmul."""
    frame = jnp.concatenate([prev_in[...], xb_ref[...]], axis=1)  # (Sp, 2B)
    X = dotp(frame, dft_ref[...])  # (Sp, 2F2p)
    xre, xim = X[:, :F2p], X[:, F2p:]

    if P > 1:
        fr = jnp.concatenate([xre, fdl_re[...][:, :(P - 1) * F2p]], axis=1)
        fi = jnp.concatenate([xim, fdl_im[...][:, :(P - 1) * F2p]], axis=1)
    else:
        fr, fi = xre, xim
    nf_re[...] = fr
    nf_im[...] = fi
    if nh_out is not None:  # hold-filter step: carried H is unchanged
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
        yt = dotp(Yall, di_ref[...])  # (4Sp, B)
        ramp = (jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
                .astype(jnp.float32) + 0.5) / B  # Mosaic: iota must be int
        y_out[...] = ramp * yt[:2 * Sp] + (1.0 - ramp) * yt[2 * Sp:]
    else:
        Yall = jnp.concatenate([ynr, yni], axis=1)
        y_out[...] = dotp(Yall, di_ref[...])


def _stream_step_kernel(crossfade: bool, Sp: int, B: int, FLp: int,
                        F2p: int, P: int, precision,
                        prev_in, xb_ref, fdl_re, fdl_im, ph_ref, started_ref,
                        h_ref, d_ref, g_ref,
                        m1_ref, m2_ref, trig_ref, dft_ref, di_ref,
                        y_out, nf_re, nf_im, nh_out):
    """One grid step = Sp streams (2·Sp filter rows laid out
    [ear0 streams; ear1 streams]); streams are independent, so the grid
    carries no cross-step state and batch size is unbounded. Filter
    assembly via the zoom matmuls (short/medium taps — the matrices
    ride VMEM)."""
    dotp = _kdot(precision)

    G = dotp(h_ref[...], m1_ref[...])  # (2Sp, 2FLp)
    c, s = _ramp_cos_sin(d_ref[...], trig_ref)
    g = g_ref[...]
    Gr, Gi = G[:, :FLp], G[:, FLp:]
    G2 = jnp.concatenate([(Gr * c - Gi * s) * g, (Gr * s + Gi * c) * g],
                         axis=1)
    H = dotp(G2, m2_ref[...])  # (2Sp, P·2F2p)
    _stream_conv_core(crossfade, Sp, B, F2p, P, dotp,
                      prev_in, xb_ref, fdl_re, fdl_im, ph_ref, started_ref,
                      H, dft_ref, di_ref, y_out, nf_re, nf_im, nh_out)


def _stream_step_asm_kernel(crossfade: bool, Sp: int, B: int, F2p: int,
                            P: int, precision,
                            n1L: int, GhL: int, T_pad: int, taps_p: int,
                            prev_in, xb_ref, fdl_re, fdl_im, ph_ref,
                            started_ref, h_ref, d_ref, g_ref,
                            fwr, fwi, ftr, fti, fmr, fmi,
                            lwr, lwi, lfr, lfi, ltr, lti,
                            flwr, flwi, flmr, flmi, fltr, flti,
                            trig_s, pmr_ref, pmi_ref, dft_ref, di_ref,
                            y_out, nf_re, nf_im, nh_out):
    """Streaming step with IN-KERNEL long-filter assembly: the BRIR
    chain of `fused_partitioned_assembled` (rfft_L of the rows, ITD
    ramp at folded bins, inverse-L, truncation, per-partition 2B
    transforms) produces scrambled partition spectra, which one-hot
    matmuls return to the natural [p][re|im] lane layout the streaming
    FDL MAC and the public `StreamState` speak — the zoom matrices this
    replaces are ~100 MB at 2048 taps and can never ride VMEM."""
    dotp = _kdot(precision)
    n1p = (2 * B) // 128
    Ghp = n1p // 2 + 1
    Fs2 = Ghp * 128

    h = h_ref[...]  # (2Sp, taps_p), rows [ear0 streams; ear1 streams]
    d = d_ref[...]
    g = g_ref[...]
    ar, ai, br, bi = _rows_to_planes(
        precision, Sp, n1L, GhL, taps_p,
        h[:Sp], h[Sp:], d[:Sp], d[Sp:], g[:Sp], g[Sp:],
        flwr, flwi, flmr, flmi, fltr, flti, trig_s)
    Hr, Hi = _asm_filters(
        dotp, Sp, P, B, n1p, Ghp, n1L, GhL, T_pad,
        ar, ai, br, bi,
        fwr, fwi, ftr, fti, fmr, fmi, lwr, lwi, lfr, lfi, ltr, lti)
    # scrambled → natural bin order; the permutation is exact, so it
    # runs at full f32 (one-hot × value — no precision to trade)
    hdot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
    Pr, Pi = pmr_ref[...], pmi_ref[...]
    ears = []
    for e in range(2):
        lanes_e = []
        for p in range(P):
            sl = slice((p * 2 + e) * Fs2, (p * 2 + e + 1) * Fs2)
            lanes_e.append(hdot(Hr[:, sl], Pr))
            lanes_e.append(hdot(Hi[:, sl], Pi))
        ears.append(jnp.concatenate(lanes_e, axis=1))  # (Sp, P·2F2p)
    H = jnp.concatenate(ears, axis=0)  # (2Sp, P·2F2p)
    _stream_conv_core(crossfade, Sp, B, F2p, P, dotp,
                      prev_in, xb_ref, fdl_re, fdl_im, ph_ref, started_ref,
                      H, dft_ref, di_ref, y_out, nf_re, nf_im, nh_out)


def _stream_hold_kernel(Sp: int, B: int, F2p: int, P: int, precision,
                        prev_in, xb_ref, fdl_re, fdl_im, ph_ref,
                        dft_ref, di_ref, y_out, nf_re, nf_im):
    """Hold-filter streaming step: NO assembly — the carried filter
    partitions (`StreamState.prev_h`) ARE the filter. Runs the shared
    post-assembly conv core with crossfade off (the filter is unchanged
    between pushes, so the blend would mix two identical outputs) and
    no prev_h write-back (it is unchanged — the caller re-carries the
    input planes); the golden semantics are `GoldenStream.push_held`.
    This is what `stream_update_rate` pushes between filter updates
    dispatch — for BRIR (asm-mode) streams it skips the per-push
    in-kernel FFT assembly chain, the dominant per-push cost."""
    dotp = _kdot(precision)
    H = ph_ref[...]
    _stream_conv_core(False, Sp, B, F2p, P, dotp,
                      prev_in, xb_ref, fdl_re, fdl_im, None, None,
                      H, dft_ref, di_ref, y_out, nf_re, nf_im, None)


def stream_hold_vmem_bytes(block: int, n_parts: int, chunk: int) -> int:
    """VMEM footprint of the hold-filter streaming step at a given
    per-grid-step stream chunk: the conv-core working set of
    `stream_step_vmem_bytes` minus the assembly terms. The crossfade-
    sized conv terms are deliberately RETAINED as slack even though the
    hold kernel runs crossfade=False (no second MAC, half the Yall rows)
    — the estimators are calibrated conservative against Mosaic's
    liveness reuse, and trimming them without an on-chip probe risks
    the round-4 over-admission failure mode. Cost: at the 2048-tap BRIR
    serving shape (block 256, P=9) the slack drops the chunk from 64 to
    32; the chunk ladder script can probe 64 on chip via the explicit
    `chunk=` override. Used by `tinaural.ops.vmem.stream_hold_chunk`."""
    F2 = block + 1
    F2p = _round_up(F2, 128)
    P = n_parts
    consts = (2 * block * 2 * F2p + 2 * F2p * block) * 4
    work = chunk * (2 * 2 * block + 2 * 2 * F2p + 4 * P * F2p
                    + 6 * P * 2 * F2p + 12 * F2p + 4 * block) * 4
    return consts + work


def stream_step_vmem_bytes(taps: int, block: int, n_streams: int) -> int:
    """Rough VMEM footprint of the fused streaming step (constants + the
    PER-GRID-STEP working set — the kernel grids over stream chunks, so
    batch size itself is unbounded) for the eligibility gate. Pure shape
    arithmetic — never materialises the matrices."""
    from .filters import DELAY_PAD, next_pow2

    T_pad = taps + DELAY_PAD
    L = next_pow2(T_pad)
    FL = L // 2 + 1
    FLp = _round_up(FL, 128)
    F2 = block + 1
    F2p = _round_up(F2, 128)
    P = -(-T_pad // block)
    taps_p = _round_up(taps, 128)
    consts = (taps_p * 2 * FLp + 2 * FLp * P * 2 * F2p + 8 * FLp
              + 2 * block * 2 * F2p + 2 * F2p * block) * 4
    Sp = min(64, _round_up(max(n_streams, 1), 8))  # per-step chunk
    work = Sp * (2 * 2 * block + 2 * 2 * F2p + 4 * P * F2p
                 + 2 * (2 * FLp + taps_p)
                 + 6 * P * 2 * F2p + 12 * F2p + 4 * block) * 4
    return consts + work


_STREAM_ASM_CHUNK = 16  # streams per grid step of the asm-mode kernel


class _StreamPack:
    """Chunk-major state packing shared by the streaming kernels. The
    update step and the hold step consume/produce the SAME layout within
    one `lax.scan` — keeping one implementation is what guarantees their
    state compatibility at stream_update_rate > 1 (round-5 review: the
    hold launcher carried a verbatim copy of these closures)."""

    def __init__(self, S: int, SC: int, F2: int, F2p: int, P: int):
        self.Sp = _round_up(max(S, 1), SC)
        self.ps = self.Sp - S
        self.nch = self.Sp // SC
        self.SC, self.F2, self.F2p, self.P = SC, F2, F2p, P

    def pad_s(self, z):  # zero-pad the stream axis S → Sp
        return jnp.pad(z, [(0, self.ps)] + [(0, 0)] * (z.ndim - 1))

    def ear_rows(self, z, lanes):  # (Sp, 2, lanes) → (2·Sp, lanes)
        z = z.reshape(self.nch, self.SC, 2, lanes).transpose(0, 2, 1, 3)
        return z.reshape(2 * self.Sp, lanes)

    def fdl_lanes(self, z):  # (S, P, F2) → (Sp, P·F2p)
        z = jnp.pad(z, [(0, self.ps), (0, 0), (0, self.F2p - self.F2)])
        return z.reshape(self.Sp, self.P * self.F2p)

    def ph_planes(self, zr, zi):
        # prev_h (S, P, 2, F2) re/im → chunk-major plane rows (2·Sp, P·2F2p)
        pf = self.F2p - self.F2
        zr = jnp.pad(zr, [(0, self.ps), (0, 0), (0, 0), (0, pf)])
        zi = jnp.pad(zi, [(0, self.ps), (0, 0), (0, 0), (0, pf)])
        z = jnp.stack([zr, zi], axis=-2)      # (Sp, P, 2ear, 2reim, F2p)
        z = z.transpose(0, 2, 1, 3, 4)        # (Sp, 2ear, P, 2reim, F2p)
        return self.ear_rows(z.reshape(self.Sp, 2, self.P * 2 * self.F2p),
                             self.P * 2 * self.F2p)

    def un_ear_rows(self, z):  # chunk-major (2·Sp, lanes) → (Sp, 2, lanes)
        z = z.reshape(self.nch, 2, self.SC, -1).transpose(0, 2, 1, 3)
        return z.reshape(self.Sp, 2, z.shape[-1])


def _stream_packing(S: int, SC: int, F2: int, F2p: int, P: int):
    pk = _StreamPack(S, SC, F2, F2p, P)
    return pk.Sp, pk.nch, pk


def _stream_row_specs(SC: int):
    """The streaming kernels' grid BlockSpecs: one-stream-chunk rows,
    two-ear rows, and whole-array constants."""
    row1 = lambda n: pl.BlockSpec((SC, n), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    row2 = lambda n: pl.BlockSpec((2 * SC, n), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    return row1, row2, const


def stream_asm_vmem_bytes(taps: int, block: int, n_streams: int,
                          chunk: int | None = None) -> int:
    """VMEM estimate of the asm-mode streaming step (in-kernel BRIR
    assembly; the zoom matrices it replaces are ~100 MB at 2048 taps)."""
    from .filters import DELAY_PAD, next_pow2

    T_pad = taps + DELAY_PAD
    L = next_pow2(T_pad)
    n1L = L // 128
    GhL = n1L // 2 + 1
    n1p = (2 * block) // 128
    Ghp = n1p // 2 + 1
    Fs2 = Ghp * 128
    F2 = block + 1
    F2p = _round_up(F2, 128)
    P = -(-T_pad // block)
    taps_p = _round_up(taps, 128)
    Sp = (chunk if chunk is not None
          else min(_STREAM_ASM_CHUNK, _round_up(max(n_streams, 1), 8)))
    consts = (8 * 128 * 128 + 4 * max(n1L, 8) * 128
              + 4 * max(n1p, 8) * 128 + 8 * GhL * 128
              + 2 * Fs2 * F2p
              + 2 * block * 2 * F2p + 2 * F2p * block) * 4
    asm_work = Sp * (2 * taps_p + 8 * GhL * 128 + 4 * GhL * 128
                     + 4 * n1L * 128 * 2 + 6 * Fs2 * 2
                     + 2 * P * 2 * Fs2) * 4
    conv_work = Sp * (2 * 2 * block + 2 * 2 * F2p + 4 * P * F2p
                      + 6 * P * 2 * F2p + 12 * F2p + 4 * block) * 4
    return consts + asm_work + conv_work


@partial(jax.jit,
         static_argnames=("taps", "block", "crossfade", "interpret",
                          "precision", "chunk"))
def fused_stream_step(h, d, g, xb, prev_in, fdl_re, fdl_im,
                      ph_re, ph_im, started,
                      taps: int, block: int, crossfade: bool = True,
                      interpret: bool = False,
                      precision=jax.lax.Precision.HIGHEST,
                      chunk: int | None = None):
    """Batched streaming step in one Pallas launch.

    h: (S, 2, taps); d, g: (S, 2); xb, prev_in: (S, B);
    fdl_re/im: (S, P, F2); ph_re/im: (S, P, 2, F2) previous filter
    partitions; started: (S,) 1.0 after the first push.
    → (y (S, 2, B), fdl_re', fdl_im', ph_re', ph_im') in the same public
    state formats as tinaural.models.streaming.StreamState.
    ``chunk`` overrides the per-grid-step stream tile (profiling /
    tuning; None = the measured default).
    """
    S, B = xb.shape
    # Mode: zoom-matmul assembly while its matrices fit VMEM; otherwise
    # the in-kernel four-step assembly (long taps / BRIR serving —
    # `_stream_step_asm_kernel`). `vmem.stream_mode` is the single
    # source of this decision (shape arithmetic only — the ~100 MB BRIR
    # zoom matrices are never materialised); a shape neither variant
    # supports raises rather than running the asm kernel on misaligned
    # partition tiles.
    from .vmem import stream_mode

    mode = stream_mode(taps, block, S)
    if mode is None:
        raise ValueError(
            f"fused_stream_step: no fused variant for taps={taps}, "
            f"block={block}, n_streams={S} (route via "
            f"models.streaming, which gates on vmem.fits_stream)")
    use_asm = mode == "asm"
    dims = _stream_dims(taps, block)
    L, FL, FLp, F2, F2p, P, taps_p = dims
    if use_asm:
        M1p = M2p = trig = None
        DFTr, DI = _stream_frame_mats(block)
    else:
        M1p, M2p, trig, DFTr, DI, dims = _stream_step_mats(taps, block)
        L, FL, FLp, F2, F2p, P, taps_p = dims
    # Per-grid-step stream chunk: small batches stay compact, large ones
    # tile at MXU-friendly row counts; memory per step is O(chunk), so
    # the serving batch size is unbounded. The asm mode defaults smaller
    # (its per-row working set is ~4× the zoom mode's).
    SC = chunk if chunk is not None else (
        min(_STREAM_ASM_CHUNK, _round_up(max(S, 1), 8)) if use_asm
        else min(64, _round_up(max(S, 1), 8)))
    Sp, nch, pk = _stream_packing(S, SC, F2, F2p, P)

    hR = pk.ear_rows(
        pk.pad_s(jnp.pad(h, [(0, 0), (0, 0), (0, taps_p - taps)])), taps_p)
    dR = pk.ear_rows(pk.pad_s(d[..., None]), 1)
    gR = pk.ear_rows(pk.pad_s(g[..., None]), 1)

    phR = pk.ph_planes(ph_re, ph_im)
    stS = jnp.pad(started.astype(jnp.float32), [(0, Sp - S)])
    st = pk.ear_rows(jnp.stack([stS, stS], axis=1)[..., None], 1)  # (2·Sp, 1)
    xbP = pk.pad_s(xb)
    pvP = pk.pad_s(prev_in)

    row1, row2, const = _stream_row_specs(SC)
    dfj, dij = jnp.asarray(DFTr), jnp.asarray(DI)
    out_specs = (row2(block), row1(P * F2p), row1(P * F2p),
                 row2(P * 2 * F2p))
    out_shape = (jax.ShapeDtypeStruct((2 * Sp, block), jnp.float32),
                 jax.ShapeDtypeStruct((Sp, P * F2p), jnp.float32),
                 jax.ShapeDtypeStruct((Sp, P * F2p), jnp.float32),
                 jax.ShapeDtypeStruct((2 * Sp, P * 2 * F2p), jnp.float32))
    data_specs = [row1(block), row1(block),
                  row1(P * F2p), row1(P * F2p),
                  row2(P * 2 * F2p), row2(1),
                  row2(taps_p), row2(1), row2(1)]
    data = (pvP, xbP, pk.fdl_lanes(fdl_re), pk.fdl_lanes(fdl_im), phR, st,
            hR, dR, gR)
    if use_asm:
        from .filters import DELAY_PAD

        n1L, GhL = L // 128, L // 128 // 2 + 1
        # the kernel's 2B-frame group order is (W, tw, mirror); the
        # L group is passed in _forward_fft_consts' own (W, mirror, tw)
        fwr, fwi, fmr, fmi, ftr, fti = _forward_fft_consts(2 * block)
        cj = [jnp.asarray(a) for a in
              (fwr, fwi, ftr, fti, fmr, fmi,
               *_epilogue_consts(L),
               *_forward_fft_consts(L),
               _ramp_trig_scrambled(L), *_scram_to_nat(2 * block))]
        outs = pl.pallas_call(
            partial(_stream_step_asm_kernel, crossfade, SC, block, F2p, P,
                    precision, n1L, GhL, taps + DELAY_PAD, taps_p),
            grid=(nch,),
            in_specs=(data_specs + [const(a) for a in cj]
                      + [const(dfj), const(dij)]),
            out_specs=out_specs, out_shape=out_shape,
            interpret=interpret,
        )(*data, *cj, dfj, dij)
    else:
        M1j, M2j = jnp.asarray(M1p), jnp.asarray(M2p)
        trj = jnp.asarray(trig)
        outs = pl.pallas_call(
            partial(_stream_step_kernel, crossfade, SC, block, FLp, F2p, P,
                    precision),
            grid=(nch,),
            in_specs=data_specs + [const(M1j), const(M2j), const(trj),
                                   const(dfj), const(dij)],
            out_specs=out_specs, out_shape=out_shape,
            interpret=interpret,
        )(*data, M1j, M2j, trj, dfj, dij)

    yR, nfr, nfi, nh = outs

    y = pk.un_ear_rows(yR)[:S]  # (S, 2, B)
    fdl_re2 = nfr.reshape(Sp, P, F2p)[:S, :, :F2]
    fdl_im2 = nfi.reshape(Sp, P, F2p)[:S, :, :F2]
    nh = pk.un_ear_rows(nh).reshape(
        Sp, 2, P, 2, F2p)  # (Sp, ear, P, reim, F2p)
    ph_re2 = nh[:S, :, :, 0].transpose(0, 2, 1, 3)[..., :F2]  # (S, P, 2, F2)
    ph_im2 = nh[:S, :, :, 1].transpose(0, 2, 1, 3)[..., :F2]
    return y, fdl_re2, fdl_im2, ph_re2, ph_im2


@partial(jax.jit,
         static_argnames=("block", "interpret", "precision", "chunk"))
def fused_stream_hold(xb, prev_in, fdl_re, fdl_im, ph_re, ph_im,
                      block: int, interpret: bool = False,
                      precision=jax.lax.Precision.HIGHEST,
                      chunk: int | None = None):
    """Batched HOLD-filter streaming step in one Pallas launch: advance
    every stream's FDL one block and render under the carried filter
    partitions, with no assembly and no crossfade
    (`RenderConfig.stream_update_rate` pushes between filter updates;
    golden semantics `GoldenStream.push_held`).

    xb, prev_in: (S, B); fdl_re/im: (S, P, F2); ph_re/im: (S, P, 2, F2)
    → (y (S, 2, B), fdl_re', fdl_im'). prev_h is UNCHANGED by a hold
    step, so it is not an output — the caller re-carries its input
    planes, saving the (S·P·2·F2) HBM write-back every held push.
    Eligibility follows the parent assembling step's gate
    (vmem.fits_stream): hold's working set is a strict subset at any
    chunk, and `vmem.stream_hold_chunk` picks the largest chunk that
    fits its own (smaller) footprint.
    """
    S, B = xb.shape
    P, F2 = fdl_re.shape[1], fdl_re.shape[2]
    F2p = _round_up(F2, 128)
    from .vmem import stream_hold_chunk

    SC = chunk if chunk is not None else stream_hold_chunk(block, P, S)
    # the SAME packing as fused_stream_step — the two steps exchange
    # state within one scan (see _StreamPack)
    Sp, nch, pk = _stream_packing(S, SC, F2, F2p, P)
    phR = pk.ph_planes(ph_re, ph_im)
    xbP = pk.pad_s(xb)
    pvP = pk.pad_s(prev_in)

    row1, row2, const = _stream_row_specs(SC)
    DFTr, DI = _stream_frame_mats(block)
    dfj, dij = jnp.asarray(DFTr), jnp.asarray(DI)
    yR, nfr, nfi = pl.pallas_call(
        partial(_stream_hold_kernel, SC, block, F2p, P, precision),
        grid=(nch,),
        in_specs=[row1(block), row1(block), row1(P * F2p), row1(P * F2p),
                  row2(P * 2 * F2p), const(dfj), const(dij)],
        out_specs=(row2(block), row1(P * F2p), row1(P * F2p)),
        out_shape=(jax.ShapeDtypeStruct((2 * Sp, block), jnp.float32),
                   jax.ShapeDtypeStruct((Sp, P * F2p), jnp.float32),
                   jax.ShapeDtypeStruct((Sp, P * F2p), jnp.float32)),
        interpret=interpret,
    )(pvP, xbP, pk.fdl_lanes(fdl_re), pk.fdl_lanes(fdl_im), phR, dfj, dij)

    y = pk.un_ear_rows(yR)[:S]  # (S, 2, B)
    fdl_re2 = nfr.reshape(Sp, P, F2p)[:S, :, :F2]
    fdl_im2 = nfi.reshape(Sp, P, F2p)[:S, :, :F2]
    return y, fdl_re2, fdl_im2


# ======================= fused inverse-FFT + OLA epilogue =====================
#
# The block renderers' epilogue — two ears' packed irfft + k-stream overlap-
# add — was the largest remaining XLA stage of the headline call (round-3
# profile: 0.65 ms of a 1.3 ms call after the packed-complex-OLA rewrite).
# This kernel runs the WHOLE epilogue in VMEM, one launch over all blocks:
#
#   Y (block spectra, both ears) ──ear-pack──▶ Zy = Y0 + j·Y1
#     ──four-step inverse FFT (MXU matmuls + VPU combine)──▶
#   z (time blocks; Re = ear0, Im = ear1) ──row-shift OLA w/ VMEM carry──▶
#   stereo output samples
#
# The inverse FFT is the classic four-step factorization n_fft = n1·128 in a
# "scrambled" frequency layout: lane sb = k1·128 + k2 holds natural bin
# k = k1 + n1·k2 (k1-major groups of 128 lanes). In this layout
#
#   stage 1  F1[k1, i2] = Σ_k2 Zm[k1, k2]·e^{+2πj·i2·k2/128}   (right matmul
#            by a shared 128×128 DFT matrix per group — MXU)
#   stage 2  F2[k1, i2] = F1[k1, i2]·e^{+2πj·i2·k1/n}          (lane const)
#   stage 3  z[i1·128+i2] = (1/n)·Σ_k1 e^{+2πj·i1·k1/n1}·F2[k1, i2]
#            (n1×n1 scalar·tile combine — VPU; n1 ≤ 16)
#
# and the OUTPUT lands in natural time order, so the overlap-add is static
# row-shifted adds with a VMEM carry across grid steps — no bit reversal,
# no transposes, no scatter. Only HALF the groups (k1 ≤ n1/2, Fs = (n1/2+1)·
# 128 bins) are stored in HBM: the per-ear spectra are Hermitian, so the
# mirror groups are reconstructed in-kernel as conj data through a flipped
# DFT matrix (Zm[g', k2] = conj(Zm[n1−g', 127−k2]) — the lane flip folds
# into the matmul constant, costing nothing). Derivation validated to 1e-14
# against numpy.fft before implementation; parity tests pin interpret mode
# and the on-chip gate pins the compiled kernel.


def _epilogue_dims(n_fft: int, B: int):
    """(n1, Gh, Fs, k_ola) for the scrambled-half epilogue layout."""
    n1 = n_fft // 128
    Gh = n1 // 2 + 1
    return n1, Gh, Gh * 128, n_fft // B


def epilogue_ok(n_fft: int, B: int) -> bool:
    """Eligibility of the fused epilogue kernel: the four-step layout needs
    n_fft = n1·128 with n1 ∈ {4, 8, 16} (n1² VPU combine — 32 would flip
    the stage-3 balance), B a lane-aligned divisor of n_fft, and the OLA
    carry bounded to the scratch's 8 rows."""
    if n_fft % 128 != 0 or B % 128 != 0 or n_fft % B != 0:
        return False
    n1, _, _, k = _epilogue_dims(n_fft, B)
    return n1 in (4, 8, 16) and 2 <= k <= 4


@lru_cache(maxsize=8)
def _scramble_maps(n_fft: int):
    """Natural-rfft → scrambled-half gather map: lane sb = k1·128 + k2 takes
    natural bin k = k1 + n1·k2 directly when k ≤ n_fft/2 and conj(bin
    n_fft − k) otherwise. Returns (idx (Fs,), sign (Fs,) f32)."""
    n1, Gh, Fs, _ = _epilogue_dims(n_fft, 128)
    sb = np.arange(Fs)
    k = sb // 128 + n1 * (sb % 128)
    mirror = k > n_fft // 2
    return (np.where(mirror, n_fft - k, k).astype(np.int32),
            np.where(mirror, -1.0, 1.0).astype(np.float32))


def scramble_spectra(Y: jax.Array, n_fft: int):
    """Natural half-spectra (..., F) complex → scrambled-half planes
    ((..., Fs) f32 re, im). One XLA gather; feeds `fused_epilogue`."""
    idx, sgn = _scramble_maps(n_fft)
    idx = jnp.asarray(idx)
    return jnp.real(Y)[..., idx], jnp.imag(Y)[..., idx] * jnp.asarray(sgn)


@lru_cache(maxsize=8)
def _epilogue_consts(n_fft: int):
    """VMEM constants of the inverse four-step: the stage-1 DFT matrix pair
    (direct groups / Hermitian-mirror groups with the lane flip folded in)
    and the per-group twiddle rows. All tiny (~0.3 MB)."""
    n1 = n_fft // 128
    k2 = np.arange(128)
    ang = 2.0 * np.pi * np.outer(k2, k2) / 128.0  # [k2, i2]
    W = np.cos(ang) + 1j * np.sin(ang)
    angf = 2.0 * np.pi * np.outer(127 - k2, k2) / 128.0  # [m, i2] flipped
    Wf = np.cos(angf) + 1j * np.sin(angf)
    # 1/n_fft folded in: stage 3 is then an UNSCALED inverse butterfly
    tw = np.exp(2j * np.pi * np.outer(np.arange(n1), k2) / n_fft) / n_fft
    twp = np.zeros((max(n1, 8), 128), np.complex128)
    twp[:n1] = tw
    return (W.real.astype(np.float32), W.imag.astype(np.float32),
            Wf.real.astype(np.float32), Wf.imag.astype(np.float32),
            twp.real.astype(np.float32), twp.imag.astype(np.float32))


_EPI_CHUNK = 64  # blocks per grid step (working set ≈ 8 MB at n_fft=2048)


def _inverse_ola_core(n1: int, Gh: int, B: int, k_ola: int, chunk: int,
                      dot, planes, mask,
                      wr_ref, wi_ref, wfr_ref, wfi_ref, twr_ref, twi_ref,
                      out0, out1, car0, car1, init_carry):
    """Shared inverse-four-step + OLA core: ear-pack the (chunk, Fs)
    spectrum planes, reconstruct the Hermitian mirror groups, run the
    inverse FFT (stage-1 matmuls, twiddles, stage-3 butterflies) and emit
    `chunk` overlap-added output rows with the VMEM tail carry. Used by
    the standalone epilogue kernel and fused into the single-launch block
    render kernel."""
    a_r, a_i, b_r, b_i = planes
    n_fft = n1 * 128
    # Zy = Y0 + j·Y1 (packed ears); Zyt = conj(Y0) + j·conj(Y1) feeds the
    # Hermitian mirror groups.
    zyr, zyi = a_r - b_i, a_i + b_r
    ztr, zti = a_r + b_i, b_r - a_i

    g = lambda z, gi: z[:, gi * 128:(gi + 1) * 128]
    # stage 1: direct groups ride one (Gh·chunk, 128) matmul pair, mirror
    # groups one ((n1−Gh)·chunk, 128) pair against the flipped constant.
    Ar = jnp.concatenate([g(zyr, gi) for gi in range(Gh)], axis=0)
    Ai = jnp.concatenate([g(zyi, gi) for gi in range(Gh)], axis=0)
    W, Wi = wr_ref[...], wi_ref[...]
    F1a_r = dot(Ar, W) - dot(Ai, Wi)
    F1a_i = dot(Ar, Wi) + dot(Ai, W)
    if Gh < n1:  # no mirror groups at n1 ≤ 2 (see _asm_filters)
        Br = jnp.concatenate([g(ztr, n1 - gi) for gi in range(Gh, n1)],
                             axis=0)
        Bi = jnp.concatenate([g(zti, n1 - gi) for gi in range(Gh, n1)],
                             axis=0)
        Wf, Wfi = wfr_ref[...], wfi_ref[...]
        F1b_r = dot(Br, Wf) - dot(Bi, Wfi)
        F1b_i = dot(Br, Wfi) + dot(Bi, Wf)

    # stage 2: per-group twiddle rows (broadcast along sublanes)
    F2r, F2i = [], []
    for gi in range(n1):
        if gi < Gh:
            fr = F1a_r[gi * chunk:(gi + 1) * chunk]
            fi = F1a_i[gi * chunk:(gi + 1) * chunk]
        else:
            j = gi - Gh
            fr = F1b_r[j * chunk:(j + 1) * chunk]
            fi = F1b_i[j * chunk:(j + 1) * chunk]
        tr, ti = twr_ref[gi:gi + 1, :], twi_ref[gi:gi + 1, :]
        F2r.append(fr * tr - fi * ti)
        F2i.append(fr * ti + fi * tr)

    # stage 3: unscaled inverse DFT over the n1 group tiles as a radix-2
    # butterfly network (the 1/n_fft scale is baked into the stage-2
    # twiddle constants).
    zg = _tile_fft(list(zip(F2r, F2i)), n1, +1.0)
    z_r = jnp.concatenate([t[0] for t in zg], axis=1)  # (chunk, n_fft) e0
    z_i = jnp.concatenate([t[1] for t in zg], axis=1)  # ear-1 time

    # overlap-add: block c emits z[c, :B] + Σ_j z[c−j, jB:(j+1)B], the
    # shifted rows coming from the VMEM carry at grid-step boundaries.
    # The mask (built from `first`) zeroes shifts that would cross a
    # source boundary in flattened multi-source batches; None = allow all
    # (the carry zero-init covers the stream start).
    km = k_ola - 1

    @pl.when(init_carry)
    def _():
        car0[...] = jnp.zeros_like(car0)
        car1[...] = jnp.zeros_like(car1)

    zt0 = jnp.concatenate([car0[0:km], z_r], axis=0)  # (km+chunk, n_fft)
    zt1 = jnp.concatenate([car1[0:km], z_i], axis=0)
    acc0, acc1 = z_r[:, :B], z_i[:, :B]
    for j in range(1, k_ola):
        s = slice(km - j, km - j + chunk)
        c = slice(j * B, (j + 1) * B)
        if mask is None:
            acc0 = acc0 + zt0[s, c]
            acc1 = acc1 + zt1[s, c]
        else:
            mj = mask[:, j - 1:j]
            acc0 = acc0 + zt0[s, c] * mj
            acc1 = acc1 + zt1[s, c] * mj
    out0[...] = acc0
    out1[...] = acc1
    car0[0:km] = z_r[chunk - km:chunk, :]
    car1[0:km] = z_i[chunk - km:chunk, :]


def _epilogue_kernel(n1: int, Gh: int, B: int, k_ola: int, chunk: int,
                     precision,
                     y0r, y0i, y1r, y1i, mask_ref,
                     wr_ref, wi_ref, wfr_ref, wfi_ref, twr_ref, twi_ref,
                     out0, out1, car0, car1):
    """One grid step = `chunk` blocks: ear-pack → inverse four-step → OLA."""
    _inverse_ola_core(
        n1, Gh, B, k_ola, chunk, _kdot(precision),
        (y0r[...], y0i[...], y1r[...], y1i[...]), mask_ref[...],
        wr_ref, wi_ref, wfr_ref, wfi_ref, twr_ref, twi_ref,
        out0, out1, car0, car1, pl.program_id(0) == 0)


@partial(jax.jit,
         static_argnames=("B", "n_fft", "interpret", "precision"))
def fused_epilogue(Ysr: jax.Array, Ysi: jax.Array, first: jax.Array,
                   B: int, n_fft: int, interpret: bool = False,
                   precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Inverse-FFT + overlap-add epilogue in one Pallas launch.

    Ysr, Ysi: (nb, 2, Fs) f32 scrambled-half block-spectrum planes (from
    `scramble_spectra`, or natively from the fused assembly+MAC kernel);
    first: (nb,) f32, 1.0 where a block starts a new source (gates the OLA
    across flattened multi-source batches). → (2, nb·B) stereo samples:
    block c's rows cover out[c·B:(c+1)·B]. Callers append k_ola−1 zero
    blocks per source to flush the final tails (out_full = (nb−1)·B +
    n_fft = (nb + k_ola − 1)·B exactly).
    """
    nb = Ysr.shape[0]
    n1, Gh, Fs, k_ola = _epilogue_dims(n_fft, B)
    Wr, Wi, Wfr, Wfi, twr, twi = _epilogue_consts(n_fft)

    nbp = _round_up(max(nb, 1), _EPI_CHUNK)
    pb = nbp - nb

    def plane(z):  # (nb, Fs) → (nbp, Fs)
        return jnp.pad(z, [(0, pb), (0, 0)])

    # OLA shift masks from `first`: shift j is allowed into row c iff no
    # new source started in (c−j, c]. Rows c < j wrap to garbage sids and
    # mask to 0, matching the zero-initialised carry.
    sid = jnp.cumsum(first.astype(jnp.int32))
    mask = jnp.stack(
        [(sid == jnp.roll(sid, j)).astype(jnp.float32)
         for j in range(1, k_ola)] +
        [jnp.zeros((nb,), jnp.float32)] * (9 - k_ola), axis=1)  # (nb, 8)
    mask = jnp.pad(mask, [(0, pb), (0, 0)], constant_values=1.0)

    grid = (nbp // _EPI_CHUNK,)
    rowb = lambda n: pl.BlockSpec((_EPI_CHUNK, n), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    Wrj, Wij = jnp.asarray(Wr), jnp.asarray(Wi)
    Wfrj, Wfij = jnp.asarray(Wfr), jnp.asarray(Wfi)
    twrj, twij = jnp.asarray(twr), jnp.asarray(twi)
    y0, y1 = pl.pallas_call(
        partial(_epilogue_kernel, n1, Gh, B, k_ola, _EPI_CHUNK, precision),
        grid=grid,
        in_specs=[rowb(Fs), rowb(Fs), rowb(Fs), rowb(Fs), rowb(8),
                  const(Wrj), const(Wij), const(Wfrj), const(Wfij),
                  const(twrj), const(twij)],
        out_specs=(rowb(B), rowb(B)),
        out_shape=(jax.ShapeDtypeStruct((nbp, B), jnp.float32),
                   jax.ShapeDtypeStruct((nbp, B), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((8, n_fft), jnp.float32),
                        pltpu.VMEM((8, n_fft), jnp.float32)],
        interpret=interpret,
    )(plane(Ysr[:, 0]), plane(Ysi[:, 0]), plane(Ysr[:, 1]), plane(Ysi[:, 1]),
      mask, Wrj, Wij, Wfrj, Wfij, twrj, twij)
    return jnp.stack([y0[:nb].reshape(-1), y1[:nb].reshape(-1)], axis=0)
