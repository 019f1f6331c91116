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


def test_profiler_trace_smoke(tmp_path):
    """utils.trace produces a profiler dump (SURVEY.md §5 tracing)."""
    import os

    import jax.numpy as jnp

    from tinaural.utils import trace

    d = tmp_path / "trace"
    with trace(str(d)):
        jnp.sum(jnp.arange(1000.0)).block_until_ready()
    files = [os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs]
    assert files, "no trace files written"


def test_cli_fit_end_to_end(tmp_path, rng):
    """fit CLI: render a 3 dB-hot target, fit, verify the personalized
    table renders closer to the target than the stock table."""
    from tinaural.config import RenderConfig
    from tinaural.models import BinauralRenderer

    sr = 44100
    x = np.clip(rng.standard_normal(1024) * 0.2, -1, 1)
    src = tmp_path / "src.wav"
    write_wav(src, sr, x, dtype="float32")

    table = load_hrir_set("synthetic")
    cfg = RenderConfig(block_size=256)
    y = np.asarray(BinauralRenderer(table, cfg).render_scene(
        x[None, :], np.array([[75.0, 10.0]]))) * np.sqrt(2.0)
    tgt = tmp_path / "target.wav"
    write_wav(tgt, sr, y.T, dtype="float32")

    out = tmp_path / "fitted.npz"
    assert main(["fit", str(src), str(tgt), str(out), "--az", "75",
                 "--el", "10", "--steps", "40", "--block", "256"]) == 0
    fitted = load_hrir_set(str(out))
    yf = np.asarray(BinauralRenderer(fitted, cfg).render_scene(
        x[None, :], np.array([[75.0, 10.0]])))
    y0 = np.asarray(BinauralRenderer(table, cfg).render_scene(
        x[None, :], np.array([[75.0, 10.0]])))
    n = min(y.shape[1], yf.shape[1])
    err_fit = np.sum((yf[:, :n] - y[:, :n]) ** 2)
    err_stock = np.sum((y0[:, :n] - y[:, :n]) ** 2)
    assert err_fit < 0.2 * err_stock


def test_cli_stream_update_rate_matches_golden(mono_wav, tmp_path):
    """--update-rate 4 routes the held-filter schedule through both the
    JAX path and the --cpu-golden mirror (push/push_held), and they
    agree; rate 1 output differs (the knob is not a no-op)."""
    a, b, c = tmp_path / "a.wav", tmp_path / "b.wav", tmp_path / "c.wav"
    args = ["stream", str(mono_wav), "--stream-block", "256",
            "--start-az", "300", "--end-az", "60"]
    assert main([args[0], args[1], str(a)] + args[2:]
                + ["--update-rate", "4"]) == 0
    assert main([args[0], args[1], str(b)] + args[2:]
                + ["--update-rate", "4", "--cpu-golden"]) == 0
    assert main([args[0], args[1], str(c)] + args[2:]) == 0
    _, ya = read_wav(a)
    _, yb = read_wav(b)
    _, yc = read_wav(c)
    assert ya.shape == yb.shape == (2048, 2)
    assert snr_db(yb, ya) > 55
    assert snr_db(yc, ya) < 40  # held schedule != per-block updates
