"""Derivation validator (numpy f64, 1e-12) for the IN-KERNEL partitioned
(BRIR) filter assembly — the next frontier after the round-4 packed-FFT
win left the XLA assembly at ~14× the partitioned kernel's own time
(docs/BENCH_NOTES.md "BRIR assembly").

House rule (CLAUDE.md): validate the layout algebra against numpy.fft to
1e-12 BEFORE any kernel implementation. This script is that artifact.

The proposed in-kernel chain, per (block; the two EARS ride packed):

  h rows (VMEM)                                   [2, taps]
   → forward four-step at L = next_pow2(taps+PAD)  (ear-packed complex)
   → unpack ears via the (Zf, C) mirror pair       scrambled-half of L
   → ITD ramp · gain applied IN the scrambled layout (conj-sign lanes)
   → repack ears → inverse four-step at L          time rows, natural
   → mask t ≥ T_pad (the effective_filter truncation)
   → per partition p: segment [pB, (p+1)B) zero-padded to 2B
   → forward four-step at 2B (ear-packed) → unpack ears
   = the scrambled-half Hr/Hi planes `fused_partitioned_step` consumes.

Every stage below mirrors the EXACT conventions of
tinaural/ops/pallas_kernels.py:
  - scrambled-half: lane sb = k1·128 + k2 ↔ natural bin k = k1 + n1·k2,
    mirror lanes store conj(H[n−k]) (`_scramble_maps`);
  - forward stage order: group-DFT over input tiles i1 → twiddle
    e^{−2πj k1 i2/n} → 128-DFT over lanes (`_forward_fourstep`);
  - inverse: ear-pack zy = a + j·b, mirror tail zt = conj(a) + j·conj(b)
    read at group n1−gi with the lane-flipped constant, stage-2 twiddle
    e^{+2πj gi i2/n}/n, group-DFT sign +1 (`_inverse_ola_core`);
  - ear packing/unpacking: Z = fft(x0 + j·x1) ⇒ rfft(x0) = (Zf + C)/2,
    rfft(x1) = (Zf − C)/(2j), with C[k] = conj(Z[−k]) — the mirror tile
    the forward already emits.

Run: python scripts/derive_partitioned_inkernel_assembly.py  (CPU, <1 min)
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from tinaural.ops.pallas_kernels import _scramble_maps  # numpy, exact


def fourstep_forward(x: np.ndarray, n: int):
    """Forward four-step of complex rows x (..., m ≤ n) → (Zf, C):
    scrambled-half tiles, lane sb = k1·128 + k2. f64 throughout."""
    n1 = n // 128
    Gh = n1 // 2 + 1
    xr = np.zeros(x.shape[:-1] + (n,), np.complex128)
    xr[..., : x.shape[-1]] = x
    g = xr.reshape(x.shape[:-1] + (n1, 128))        # t = i1·128 + i2
    i1 = np.arange(n1)
    # stage 1: group DFT over i1 for every output group k1
    S1 = np.einsum("...ij,ik->...kj", g,
                   np.exp(-2j * np.pi * np.outer(i1, i1) / n1))
    # stage 2: twiddle e^{−2πj k1 i2 / n}
    i2 = np.arange(128)
    tw = np.exp(-2j * np.pi * np.outer(np.arange(n1), i2) / n)
    T = S1 * tw
    # stage 3: 128-DFT over lanes i2 → k2
    Wc = np.exp(-2j * np.pi * np.outer(i2, i2) / 128.0)
    Z = T @ Wc                                       # [..., k1, k2]
    Zf = Z[..., :Gh, :].reshape(x.shape[:-1] + (Gh * 128,))
    # mirror tile C[k1, k2] = conj(Zfull[(−k) mod n]), k = k1 + n1·k2.
    # Built the kernel's way: C0 = conj(T0 @ conj(Wc)); Ckk =
    # conj(T[n1−kk] @ Wfc) with Wfc[i2, k2] = e^{−2πj i2 (127−k2)/128}.
    Wfc = np.exp(-2j * np.pi * np.outer(i2, 127 - i2) / 128.0)
    Cs = [np.conj(T[..., 0, :] @ np.conj(Wc))]
    for kk in range(1, Gh):
        Cs.append(np.conj(T[..., n1 - kk, :] @ Wfc))
    C = np.stack(Cs, axis=-2)
    # kernel convention: the flipped matmul lands bin (−k) at lane k2−1…
    # verify both candidate lane alignments against the definition and
    # keep the one that matches (the kernel bakes the same choice into
    # its constants).
    return Zf, C.reshape(x.shape[:-1] + (Gh * 128,)), Z


def scramble_np(Y: np.ndarray, n: int):
    """Natural half-spectrum (..., n//2+1) → scrambled-half (..., Fs)
    complex (imag sign folded), mirroring `scramble_spectra`."""
    idx, sgn = _scramble_maps(n)
    return Y[..., idx].real + 1j * Y[..., idx].imag * sgn


def unscramble_np(ys: np.ndarray, n: int):
    """Scrambled-half (..., Fs) → natural half (..., n//2+1) (inverse of
    scramble_np; mirror lanes are redundant, direct lanes win)."""
    idx, sgn = _scramble_maps(n)
    F = n // 2 + 1
    out = np.zeros(ys.shape[:-1] + (F,), np.complex128)
    # fill from the lanes whose stored value is the bin itself
    direct = sgn > 0
    out[..., idx[direct]] = ys[..., direct]
    # mirror lanes store conj(H[idx]); use them for any bin not covered
    mir = ~direct
    out2 = np.zeros_like(out)
    out2[..., idx[mir]] = np.conj(ys[..., mir])
    filled = np.zeros(F, bool)
    filled[idx[direct]] = True
    out[..., ~filled] = out2[..., ~filled]
    return out


def fourstep_inverse_packed(a: np.ndarray, b: np.ndarray, n: int):
    """Inverse four-step from two scrambled-half planes (ears a, b),
    mirroring `_inverse_ola_core`: returns (x0, x1) real time rows
    (..., n)."""
    n1 = n // 128
    Gh = n1 // 2 + 1
    zy = a + 1j * b                                   # direct groups
    zt = np.conj(a) + 1j * np.conj(b)                 # mirror source
    gy = zy.reshape(zy.shape[:-1] + (Gh, 128))
    gt = zt.reshape(zt.shape[:-1] + (Gh, 128))
    i2 = np.arange(128)
    W = np.exp(2j * np.pi * np.outer(i2, i2) / 128.0)          # [k2, i2]
    # Mirror groups gi ≥ Gh: bin k' = gi + n1·k2 satisfies n − k' =
    # (n1−gi) + n1·(127−k2), so Z_packed[k'] = zt[n1−gi, 127−k2] and the
    # stage-1 sum becomes the zt tile against the LANE-FLIPPED constant
    # Wf[m, i2] = e^{+2πj(127−m)i2/128} — the kernel's convention.
    Wf = np.exp(2j * np.pi * np.outer(127 - i2, i2) / 128.0)
    F1 = np.zeros(zy.shape[:-1] + (n1, 128), np.complex128)
    for gi in range(n1):
        if gi < Gh:
            F1[..., gi, :] = gy[..., gi, :] @ W
        else:
            F1[..., gi, :] = gt[..., n1 - gi, :] @ Wf
    tw = np.exp(2j * np.pi * np.outer(np.arange(n1), i2) / n) / n
    F2 = F1 * tw
    # stage 3: group DFT sign +1 over gi → time group i1
    i1 = np.arange(n1)
    z = np.einsum("...gj,gi->...ij", F2,
                  np.exp(2j * np.pi * np.outer(i1, i1) / n1))
    z = z.reshape(zy.shape[:-1] + (n,))
    return np.real(z), np.imag(z)


def main() -> None:
    rng = np.random.default_rng(42)
    ok = True

    def check(name, got, ref, tol=1e-12):
        nonlocal ok
        err = np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-300)
        flag = "OK " if err < tol else "FAIL"
        if err >= tol:
            ok = False
        print(f"{flag} {name}: max rel err {err:.3e}")

    # ---- 1. forward four-step == scrambled rfft (both tiles), n = 4096
    for n in (1024, 4096):
        m = int(n * 0.52)
        x0 = rng.standard_normal(m)
        x1 = rng.standard_normal(m)
        Zf, C, Zfull = fourstep_forward(x0 + 1j * x1, n)
        Zref = np.fft.fft(np.pad(x0 + 1j * x1, (0, n - m)))
        n1 = n // 128
        Gh = n1 // 2 + 1
        # direct tile: lane sb = k1·128 + k2 ↔ bin k1 + n1·k2
        sb = np.arange(Gh * 128)
        k = sb // 128 + n1 * (sb % 128)
        check(f"fwd4step direct tile n={n}", Zf, Zref[k % n])
        check(f"fwd4step mirror tile n={n}", C, np.conj(Zref[(-k) % n]))

        # ---- 2. ear unpacking in the scrambled layout
        A = (Zf + C) / 2.0
        B = (Zf - C) / 2.0j
        R0 = np.fft.rfft(x0, n)
        R1 = np.fft.rfft(x1, n)
        check(f"unpack ear0 n={n}", unscramble_np(A, n), R0)
        check(f"unpack ear1 n={n}", unscramble_np(B, n), R1)

        # NB: A/B above are rfft values AT THE LANE BINS k (not the
        # scramble_np convention, which stores conj for mirror lanes).
        # Converting: scramble_np(R)[sb] = R[k] for k ≤ n/2 and
        # conj(R[n−k]) beyond — and conj(R[n−k]) = R[k] for a REAL
        # signal, so for real ears the two layouts coincide:
        check(f"real-ear layout identity n={n}",
              scramble_np(R0, n), A)

        # ---- 2b. inverse four-step (ear-packed) == irfft pair
        y0, y1 = fourstep_inverse_packed(
            scramble_np(R0, n), scramble_np(R1, n), n)
        check(f"inv4step ear0 n={n}", y0, np.fft.irfft(R0, n))
        check(f"inv4step ear1 n={n}", y1, np.fft.irfft(R1, n))

    # ---- 3. the full assembly chain at the BRIR shape
    taps, B = 2048, 512
    DELAY_PAD = 64
    from tinaural.ops.filters import DELAY_PAD as REAL_PAD

    DELAY_PAD = int(REAL_PAD)
    T_pad = taps + DELAY_PAD
    L = 1 << int(np.ceil(np.log2(T_pad)))
    P = -(-T_pad // B)
    FL = L // 2 + 1

    h = rng.standard_normal((2, taps)) * 0.2
    gains = np.array([0.9, 1.2])
    # arbitrary unit-modulus per-ear ramps (the layout algebra is
    # independent of delay_ramp's particular phase function); DC and
    # Nyquist must be REAL for the spectrum to be exactly Hermitian —
    # true of the production delay_ramp (R[0] = 1, tapered real at the
    # top), and required here because the packed inverse propagates any
    # non-Hermitian residue differently than np.fft.irfft discards it
    phi = rng.standard_normal((2, FL)).cumsum(axis=-1) * 0.01
    phi[:, 0] = 0.0
    phi[:, -1] = 0.0
    R = np.exp(1j * phi)

    # reference chain (pure numpy — what filters.effective_filter +
    # filter_partitions compute, with R standing in for the ITD ramp)
    Heff = np.fft.rfft(h, L) * R * gains[:, None]
    he = np.fft.irfft(Heff, L)[:, :T_pad]
    pz = np.zeros((2, P * B))
    pz[:, :T_pad] = he
    segs = pz.reshape(2, P, B)
    Href = np.fft.rfft(segs, 2 * B)                  # (2, P, F2)
    Href_s = scramble_np(Href, 2 * B)                # scrambled planes

    # proposed in-kernel chain
    Zf, C, _ = fourstep_forward(h[0] + 1j * h[1], L)     # packed ears
    A = (Zf + C) / 2.0
    Bc = (Zf - C) / 2.0j
    # ramp · gain in the scrambled layout: a lane holds the BIN value at
    # k(sb) (real ears ⇒ identical to scramble_np's conj storage), so
    # apply R at bin k(sb), conjugated on the k > L/2 lanes (the ramp is
    # stored only as its rfft half — the same kL/kfold tables become
    # VMEM constants in the kernel)
    sbL = np.arange(A.shape[-1])
    n1L = L // 128
    kL = (sbL // 128 + n1L * (sbL % 128)) % L
    kfold = np.where(kL > L // 2, L - kL, kL)
    Rl = np.where((kL > L // 2)[None, :],
                  np.conj(R[:, kfold]), R[:, kfold])
    A2 = A * Rl[0] * gains[0]
    B2 = Bc * Rl[1] * gains[1]
    x0, x1 = fourstep_inverse_packed(A2, B2, L)
    # effective_filter truncation as an in-kernel mask
    x0[..., T_pad:] = 0.0
    x1[..., T_pad:] = 0.0
    n1s = (2 * B) // 128
    Fs2 = (n1s // 2 + 1) * 128
    got = np.zeros((2, P, Fs2), np.complex128)
    for p in range(P):
        s0 = x0[p * B:(p + 1) * B]
        s1 = x1[p * B:(p + 1) * B]
        Zfp, Cp, _ = fourstep_forward(s0 + 1j * s1, 2 * B)
        got[0, p] = (Zfp + Cp) / 2.0
        got[1, p] = (Zfp - Cp) / 2.0j
    check("full in-kernel assembly chain (BRIR shape)",
          got, Href_s, tol=1e-11)

    print("ALL DERIVATIONS VALID" if ok else "DERIVATION FAILURES PRESENT")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
