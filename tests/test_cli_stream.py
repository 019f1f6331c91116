"""CLI stream/export subcommands."""

import numpy as np
import pytest

from tinaural.cli import main
from tinaural.data import load_hrir_set, read_wav, write_wav

from conftest import snr_db


@pytest.fixture()
def mono_wav(tmp_path, rng):
    p = tmp_path / "in.wav"
    write_wav(p, 44100, np.clip(rng.standard_normal(2048) * 0.2, -1, 1))
    return p


def test_cli_stream_matches_golden(mono_wav, tmp_path):
    a, b = tmp_path / "a.wav", tmp_path / "b.wav"
    assert main(["stream", str(mono_wav), str(a), "--stream-block", "256",
                 "--start-az", "300", "--end-az", "60"]) == 0
    assert main(["stream", str(mono_wav), str(b), "--stream-block", "256",
                 "--start-az", "300", "--end-az", "60", "--cpu-golden"]) == 0
    _, ya = read_wav(a)
    _, yb = read_wav(b)
    assert ya.shape == yb.shape == (2048, 2)
    assert snr_db(yb, ya) > 55


def test_cli_export_roundtrip(tmp_path, rng):
    npz = tmp_path / "table.npz"
    assert main(["export", str(npz)]) == 0
    t = load_hrir_set(str(npz))
    ref = load_hrir_set("synthetic")
    np.testing.assert_array_equal(np.asarray(t.h), np.asarray(ref.h))
    assert t.decomposed
