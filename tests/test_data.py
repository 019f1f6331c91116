"""M0 tests: grids, synthetic fixture, table decomposition, WAV I/O, loaders."""

import numpy as np
import pytest

from tinaural.data import (
    HrirTable,
    build_table,
    estimate_delays,
    fractional_shift,
    kemar_grid,
    load_hrir_set,
    read_wav,
    synthesize_hrirs,
    write_wav,
)
from tinaural.data.grids import SphericalGrid

from conftest import snr_db


def test_kemar_grid_geometry():
    g = kemar_grid()
    assert g.n_elevs == 14
    assert g.a_max == 72
    assert g.n_directions == 710  # the published MIT KEMAR direction count
    assert g.az_counts[list(g.elevs).index(0.0)] == 72
    assert g.az_counts[-1] == 1  # the pole
    mask = g.validity_mask()
    assert mask.sum() == 710


def test_ring_azimuths_equally_spaced():
    g = kemar_grid()
    az = g.ring_azimuths(4)  # elev 0 ring, 72 entries
    assert len(az) == 72
    assert np.allclose(np.diff(az), 5.0)


def test_synthetic_shapes_and_determinism():
    h1, g = synthesize_hrirs(taps=128)
    h2, _ = synthesize_hrirs(taps=128)
    assert h1.shape == (14, 72, 2, 128)
    np.testing.assert_array_equal(h1, h2)
    # invalid cells are zero
    assert np.all(h1[~g.validity_mask()] == 0)


def test_synthetic_itd_sign():
    """A source at azimuth 90 (hard right) must reach the right ear first."""
    h, g = synthesize_hrirs(noise=0.0)
    e0 = list(g.elevs).index(0.0)
    a90 = 18  # 90° / 5° spacing on the elev-0 ring
    d = estimate_delays(h[e0, a90])  # (2,) left, right
    assert d[1] < d[0]  # right ear earlier
    # Woodworth ITD at 90°: (a/c)(1 + π/2) ≈ 0.66 ms ≈ 29 samples @44.1k
    itd = d[0] - d[1]
    assert 20 < itd < 40


def test_synthetic_ild_sign():
    """Right-side source must be louder in the right ear."""
    h, g = synthesize_hrirs(noise=0.0)
    e0 = list(g.elevs).index(0.0)
    energy = np.sum(h[e0, 18] ** 2, axis=-1)  # (2,)
    assert energy[1] > 2.0 * energy[0]


def test_fractional_shift_roundtrip(rng):
    """delay_ramp is exactly invertible: shift(+d) then shift(−d) is the
    identity (the decomposition contract; see the ramp's docstring)."""
    x = rng.standard_normal(128)
    for d in (0.0, 1.625, -3.25, 10.0, 23.499, 23.501):
        y = fractional_shift(fractional_shift(x, np.array(d)), np.array(-d))
        assert snr_db(x, y) > 200


def test_fractional_shift_roundtrip_half_integer_tie(rng):
    """At EXACT half-integer delays (measure zero) the ramp's Nyquist-bin
    flip cannot roundtrip (exact inversion + a real Nyquist value + d-
    continuity are jointly impossible there — ramp docstring); the error
    must be confined to that single bin."""
    x = rng.standard_normal(128)
    y = fractional_shift(fractional_shift(x, np.array(1.5)), np.array(-1.5))
    X, Y = np.fft.rfft(x), np.fft.rfft(y)
    planes = lambda z: np.stack([z.real, z.imag])  # snr_db would drop imag
    assert snr_db(planes(X[:-1]), planes(Y[:-1])) > 200  # sub-Nyquist exact


def test_estimate_delays_on_known_shift(rng):
    """Delay estimator recovers a known fractional shift of a pulse."""
    t = np.arange(128)
    pulse = np.exp(-0.5 * ((t - 20) / 3.0) ** 2) * np.cos(0.3 * t)
    for d in (0.0, 2.5, 7.25):
        shifted = fractional_shift(pulse, np.array(d))
        est = estimate_delays(shifted) - estimate_delays(pulse)
        assert abs(est - d) < 0.05


def test_decomposition_reconstruction():
    """gain · delay(aligned) circularly reconstructs the raw HRIR."""
    from tinaural.data.table import ALIGN_GUARD

    h, g = synthesize_hrirs(noise=0.0)
    t = build_table(h, g, 44100, decompose=True)
    mask = g.validity_mask()
    recon = fractional_shift(np.asarray(t.h, dtype=np.float64),
                             np.asarray(t.delays, dtype=np.float64) - ALIGN_GUARD)
    recon *= np.asarray(t.gains, dtype=np.float64)[..., None]
    assert snr_db(h[mask], recon[mask]) > 100  # circular shift is exact


def test_aligned_shapes_have_no_wrap():
    """Aligned shapes keep onset at ~ALIGN_GUARD; the frame end is quiet,
    so zero-padding them to other FFT sizes cannot shred the spectrum
    (the bug behind the 440 Hz lateralization inversion)."""
    h, g = synthesize_hrirs(noise=0.0)
    t = build_table(h, g, 44100, decompose=True)
    a = np.asarray(t.h, dtype=np.float64)
    tail = np.sum(a[..., -16:] ** 2, axis=-1)  # (E, A, 2), shapes are unit-energy
    # The synthetic fixture itself carries ~-20 dB of acausal band-edge
    # ringing ahead of the onset (present in the raw data too); the bug
    # this guards against parked ~0.34 of the energy here.
    assert np.max(tail[g.validity_mask()]) < 0.05


def test_load_hrir_set_synthetic():
    t = load_hrir_set("synthetic")
    assert isinstance(t, HrirTable)
    assert t.decomposed
    assert t.h.shape == (14, 72, 2, 128)
    assert t.sample_rate == 44100
    # aligned shapes are unit-energy where valid
    e = np.sum(np.asarray(t.h, dtype=np.float64) ** 2, axis=-1)
    valid = np.asarray(t.valid) > 0
    np.testing.assert_allclose(e[valid], 1.0, atol=1e-3)


def test_wav_roundtrip(tmp_path, rng):
    x = np.clip(rng.standard_normal(1000) * 0.2, -1, 1)
    p = tmp_path / "t.wav"
    write_wav(p, 44100, x)
    sr, y = read_wav(p)
    assert sr == 44100
    assert snr_db(x, y) > 70  # int16 quantization noise floor
    p32 = tmp_path / "t32.wav"
    write_wav(p32, 48000, np.stack([x, -x], axis=1), dtype="float32")
    sr, y = read_wav(p32)
    assert sr == 48000 and y.shape == (1000, 2)
    assert snr_db(x, y[:, 0]) > 120


def test_kemar_dir_loader_compact(tmp_path):
    """Structural test of the compact-KEMAR directory loader using fixture
    files: front half written to disk, back half recovered by mirroring."""
    h, g = synthesize_hrirs(taps=32, noise=0.0)
    # write a two-ring subset: elev 50 (45 az) and elev 90 (1 az)
    for e_deg in (50, 90):
        e_i = list(g.elevs).index(float(e_deg))
        d = tmp_path / f"elev{e_deg}"
        d.mkdir()
        for a_i, az in enumerate(g.ring_azimuths(e_i)):
            if az <= 180.0:  # KEMAR ships only the front/right half
                write_wav(d / f"H{e_deg}e{int(round(az)) % 360:03d}a.wav", 44100,
                          h[e_i, a_i].T, dtype="float32")
    t = load_hrir_set(str(tmp_path), decompose=False)
    assert t.h.shape[0] == 2 and t.taps == 32
    sub = SphericalGrid(elevs=np.array([50.0, 90.0]), az_counts=np.array([45, 1]))
    e_i = list(g.elevs).index(50.0)
    # a mirrored azimuth: az index 30 → az 240° → mirror of 120° ear-swapped
    az = sub.ring_azimuths(0)[30]
    assert az > 180
    src_i = int(round((360 - az) / (360 / 45)))
    got = np.asarray(t.h[0, 30], dtype=np.float64)
    want = h[e_i, src_i][::-1]
    assert snr_db(want, got) > 120


def test_sofa_loader(tmp_path):
    """Structural test of the SOFA loader on a ring-structured fixture."""
    import h5py

    h, g = synthesize_hrirs(taps=64, noise=0.0)
    # build M×2×T from two rings; SOFA files store COUNTERCLOCKWISE
    # azimuths (90° = left), so the fixture writes the mirrored angle
    rows, pos = [], []
    for e_deg in (0.0, 10.0):
        e_i = list(g.elevs).index(e_deg)
        for a_i, az in enumerate(g.ring_azimuths(e_i)):
            rows.append(h[e_i, a_i])
            pos.append([(360.0 - az) % 360.0, e_deg, 1.4])
    ir = np.stack(rows)
    p = tmp_path / "fixture.sofa"
    with h5py.File(p, "w") as f:
        f["Data.IR"] = ir
        f["SourcePosition"] = np.array(pos)
        f["Data.SamplingRate"] = np.array([44100.0])
    t = load_hrir_set(str(p), decompose=False)
    assert t.h.shape == (2, 72, 2, 64)
    assert t.sample_rate == 44100
    e_i = list(g.elevs).index(0.0)
    assert snr_db(h[e_i, :72], np.asarray(t.h[0], dtype=np.float64)) > 120


def test_loader_resamples_to_target_rate():
    """target_sample_rate polyphase-resamples; ITD in samples scales with
    the rate (physical ITD in seconds is preserved)."""
    t44 = load_hrir_set("synthetic", noise=0.0)
    t48 = load_hrir_set("synthetic", noise=0.0, target_sample_rate=48000)
    assert t48.sample_rate == 48000
    assert t48.taps % 2 == 0
    assert abs(t48.taps - 128 * 48000 / 44100) <= 2
    e0 = list(np.asarray(t44.elevs)).index(0.0)
    itd = lambda t: (np.asarray(t.delays, dtype=np.float64)[e0, 18, 0]
                     - np.asarray(t.delays, dtype=np.float64)[e0, 18, 1])
    itd_sec_44 = itd(t44) / 44100
    itd_sec_48 = itd(t48) / 48000
    assert abs(itd_sec_44 - itd_sec_48) < 2e-5  # < 1 sample @48k


def test_malformed_sources_fail_cleanly(tmp_path):
    """Loader fuzz: malformed inputs produce clear errors, not tracebacks
    from deep inside h5py/numpy."""
    import h5py

    # SOFA with mono IRs
    bad = tmp_path / "mono.sofa"
    with h5py.File(bad, "w") as f:
        f["Data.IR"] = np.zeros((4, 1, 32))
        f["SourcePosition"] = np.zeros((4, 3))
        f["Data.SamplingRate"] = np.array([44100.0])
    with pytest.raises(ValueError, match="must be"):
        load_hrir_set(str(bad))

    # SOFA with a non-ring grid
    scattered = tmp_path / "scattered.sofa"
    with h5py.File(scattered, "w") as f:
        f["Data.IR"] = np.zeros((3, 2, 32))
        f["SourcePosition"] = np.array([[0.0, 0.0, 1], [10.0, 0.0, 1],
                                        [200.0, 0.0, 1]])
        f["Data.SamplingRate"] = np.array([44100.0])
    with pytest.raises(ValueError, match="ring"):
        load_hrir_set(str(scattered))

    # KEMAR dir with an elevation not on the KEMAR grid
    d = tmp_path / "elev33"
    d.mkdir()
    with pytest.raises(ValueError, match="not in the KEMAR grid"):
        load_hrir_set(str(tmp_path))

    # missing azimuth file (and mirror)
    import shutil

    shutil.rmtree(d)
    d2 = tmp_path / "elev90"
    d2.mkdir()  # ring needs 1 file; none present
    with pytest.raises(FileNotFoundError, match="missing HRIR"):
        load_hrir_set(str(tmp_path))


def test_sofa_loader_receiver_order_and_conventions(tmp_path):
    """Round-5 review hardening: a SOFA file listing the RIGHT ear as
    receiver 0 loads with ears swapped back to (L, R); a wrap-noisy
    az=0 point (recorded just under 360) stays within ring tolerance;
    cartesian SourcePosition is rejected with a clear message; radian
    units convert."""
    import h5py

    h, g = synthesize_hrirs(taps=64, noise=0.0)
    e_i = list(g.elevs).index(0.0)
    ring = g.ring_azimuths(e_i)
    rows, pos = [], []
    for a_i, az in enumerate(ring):
        rows.append(h[e_i, a_i][::-1])  # store as (R, L)
        sofa_az = (360.0 - az) % 360.0
        if a_i == 0:
            sofa_az = 359.95  # wrap noise on the zero point
        pos.append([sofa_az, 0.0, 1.4])
    p = tmp_path / "swapped.sofa"
    with h5py.File(p, "w") as f:
        f["Data.IR"] = np.stack(rows)
        sp = f.create_dataset("SourcePosition", data=np.array(pos))
        sp.attrs["Type"] = np.bytes_("spherical")
        sp.attrs["Units"] = np.bytes_("degree, degree, metre")
        # right ear (y < 0) FIRST
        rp = f.create_dataset(
            "ReceiverPosition",
            data=np.array([[0.0, -0.09, 0.0], [0.0, 0.09, 0.0]]))
        rp.attrs["Type"] = np.bytes_("cartesian")
        f["Data.SamplingRate"] = np.array([44100.0])
    t = load_hrir_set(str(p), decompose=False)
    assert snr_db(h[e_i, : len(ring)], np.asarray(t.h[0], np.float64)) > 120

    # cartesian SourcePosition → loud, clear rejection
    q = tmp_path / "cart.sofa"
    with h5py.File(q, "w") as f:
        f["Data.IR"] = np.stack(rows)
        sp = f.create_dataset("SourcePosition", data=np.array(pos))
        sp.attrs["Type"] = np.bytes_("cartesian")
        f["Data.SamplingRate"] = np.array([44100.0])
    with pytest.raises(ValueError, match="not supported"):
        load_hrir_set(str(q))

    # radian units convert on load
    r = tmp_path / "radians.sofa"
    pos_r = np.array(pos)
    pos_r[:, :2] = np.radians(pos_r[:, :2])
    with h5py.File(r, "w") as f:
        f["Data.IR"] = np.stack([h[e_i, a_i] for a_i in range(len(ring))])
        sp = f.create_dataset("SourcePosition", data=pos_r)
        sp.attrs["Units"] = np.bytes_("radian, radian, metre")
        f["Data.SamplingRate"] = np.array([44100.0])
    t2 = load_hrir_set(str(r), decompose=False)
    assert snr_db(h[e_i, : len(ring)], np.asarray(t2.h[0], np.float64)) > 120

    # spherical RECEIVER positions in radian units, already in correct
    # (L, R) order — L at az π/2 (y > 0), R at 3π/2. Second round-5
    # review pass: the ear-order check read these as tiny positive
    # degree angles (sin > 0 for both, 1.57r < 4.71r) and swapped the
    # ears on a correctly-ordered file.
    s = tmp_path / "radian_receiver.sofa"
    with h5py.File(s, "w") as f:
        f["Data.IR"] = np.stack([h[e_i, a_i] for a_i in range(len(ring))])
        sp = f.create_dataset("SourcePosition", data=np.array(pos))
        sp.attrs["Type"] = np.bytes_("spherical")
        sp.attrs["Units"] = np.bytes_("degree, degree, metre")
        rp = f.create_dataset(
            "ReceiverPosition",
            data=np.array([[np.pi / 2, 0.0, 0.09],
                           [3 * np.pi / 2, 0.0, 0.09]]))
        rp.attrs["Type"] = np.bytes_("spherical")
        rp.attrs["Units"] = np.bytes_("radian, radian, metre")
        f["Data.SamplingRate"] = np.array([44100.0])
    t3 = load_hrir_set(str(s), decompose=False)
    assert snr_db(h[e_i, : len(ring)], np.asarray(t3.h[0], np.float64)) > 120


def test_wav_int16_rounds_not_truncates(tmp_path):
    x = np.array([0.99996, -0.99996, 1.5e-5])
    p = tmp_path / "q.wav"
    write_wav(p, 44100, x)
    _, y = read_wav(p)
    q = np.round(x * (2.0**15 - 1)).astype(np.int16)
    np.testing.assert_array_equal((y * 2.0**15).astype(np.int16), q)
