"""Op-level unit tests (FFT packing, etc.)."""

import numpy as np

from conftest import snr_db




def test_fft_pair_packing_exact(rng):
    """Two-for-one packed transforms == the unpacked rfft/irfft pairs."""
    import jax
    import jax.numpy as jnp
    from tinaural.ops.fftpack import irfft_pair, rfft_pair

    n = 512
    a = rng.standard_normal((5, 300)).astype(np.float32)
    b = rng.standard_normal((5, 300)).astype(np.float32)
    A, B = jax.jit(lambda a, b: rfft_pair(a, b, n))(a, b)
    Ar = np.fft.rfft(a.astype(np.float64), n)
    Br = np.fft.rfft(b.astype(np.float64), n)
    for got, ref in ((A, Ar), (B, Br)):
        got = np.asarray(got, np.complex128)
        assert snr_db(np.stack([ref.real, ref.imag]),
                      np.stack([got.real, got.imag])) > 120

    ya, yb = jax.jit(lambda r, i, s, t: irfft_pair(
        jax.lax.complex(r, i), jax.lax.complex(s, t), n))(
        Ar.real.astype(np.float32), Ar.imag.astype(np.float32),
        Br.real.astype(np.float32), Br.imag.astype(np.float32))
    assert snr_db(np.fft.irfft(Ar, n), np.asarray(ya)) > 120
    assert snr_db(np.fft.irfft(Br, n), np.asarray(yb)) > 120


def test_filter_partitions_packed_matches_unpacked(rng):
    """The ear-packed fft-chain assembly (pack=True — the BRIR-path
    default via config.fft_pack) is the same linear map as the unpacked
    chain, per partition, both impls. Measured 127.6 dB on chip; this
    pins the CPU lowering too."""
    import jax
    import jax.numpy as jnp
    from tinaural.ops.filters import filter_partitions

    taps, block = 2048, 512
    h = rng.standard_normal((4, 2, taps)).astype(np.float32) * 0.1
    d = rng.uniform(-8, 8, (4, 2)).astype(np.float32)
    g = rng.uniform(0.5, 1.5, (4, 2)).astype(np.float32)

    def run(pack, impl="xla"):
        f = jax.jit(jax.vmap(lambda hh, dd, gg: filter_partitions(
            hh, dd, gg, taps, block, use_matmul=False, pack=pack,
            impl=impl)))
        H = f(h, d, g)
        return np.asarray(jnp.stack([H.real, H.imag]))

    ref = run(False)
    for impl in ("xla", "matmul"):
        got = run(True, impl)
        assert got.shape == ref.shape
        assert snr_db(ref, got) > 110, impl


def test_mmfft_matches_numpy(rng):
    """Two-stage matmul FFT == np.fft.fft/ifft to f32 precision."""
    import jax
    from tinaural.ops.mmfft import fft_planes

    for n in (256, 512, 2048, 4096):
        z = (rng.standard_normal((6, n)) + 1j * rng.standard_normal((6, n)))
        xr = z.real.astype(np.float32)
        xi = z.imag.astype(np.float32)
        for inverse in (False, True):
            Xr, Xi = jax.jit(
                lambda a, b, inv=inverse, nn=n: fft_planes(a, b, nn, inv))(xr, xi)
            ref = (np.fft.ifft if inverse else np.fft.fft)(z)
            got = np.stack([np.asarray(Xr, np.float64), np.asarray(Xi, np.float64)])
            want = np.stack([ref.real, ref.imag])
            assert snr_db(want, got) > 100, (n, inverse)
