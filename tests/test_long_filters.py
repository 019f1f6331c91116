"""Long-HRIR coverage: 256-tap table with a 128-sample stream block gives
P = 3 filter partitions — exercises the multi-slot FDL (delay-line roll,
per-partition MAC) that the default 128-tap/256-block setup collapses to
P = 1. Also runs the block renderers at a non-default taps/n_fft ratio.
(Full MIT KEMAR is 512 taps — SURVEY.md §3.1.)"""

import numpy as np
import pytest

from tinaural.config import RenderConfig
from tinaural.data import load_hrir_set
from tinaural.models import BinauralRenderer, Stream
from tinaural.models.streaming import _n_parts
from tinaural.reference import golden

from conftest import snr_db


@pytest.fixture(scope="module")
def long_table():
    return load_hrir_set("synthetic", taps=256)


def test_multi_partition_stream(long_table, rng):
    cfg = RenderConfig(stream_block=128)
    assert _n_parts(long_table, cfg) == 3  # (256+64)/128
    s = Stream(long_table, cfg)
    gs = golden.GoldenStream(long_table, cfg)
    x = rng.standard_normal(10 * 128)
    for i in range(10):
        xb = x[i * 128 : (i + 1) * 128]
        az, el = 15.0 * i, 4.0 * i - 20.0
        y = np.asarray(s.push(xb, az, el))
        ref = gs.push(xb, az, el)
        assert snr_db(ref, y) > 60, f"block {i}"


def test_multi_partition_stream_matches_static(long_table, rng):
    """P=3 UPOLS == direct convolution for a fixed direction."""
    cfg = RenderConfig(stream_block=128, out_length="same")
    x = rng.standard_normal(12 * 128)
    gs = golden.GoldenStream(long_table, cfg)
    y = np.concatenate(
        [gs.push(x[i * 128 : (i + 1) * 128], 77.0, 33.0) for i in range(12)],
        axis=1)
    ref = golden.render_static(long_table, x, 77.0, 33.0, cfg)
    assert snr_db(ref, y) > 120


def test_long_taps_trajectory_parity(long_table, rng):
    cfg = RenderConfig(block_size=256)  # n_fft = next_pow2(256+320-1) = 1024
    x = rng.standard_normal(1200)
    nb = -(-1200 // 256)
    dirs = np.stack([np.linspace(10, 350, nb), np.linspace(-40, 90, nb)], axis=1)
    y = np.asarray(BinauralRenderer(long_table, cfg).render_trajectory(x, dirs))
    ref = golden.render_trajectory(long_table, x, dirs, cfg)
    assert y.shape == ref.shape
    assert snr_db(ref, y) > 60


def test_long_taps_static_parity(long_table, rng):
    x = rng.standard_normal(2000)
    y = np.asarray(BinauralRenderer(long_table, RenderConfig()).render(x, 200.0, -5.0))
    ref = golden.render_static(long_table, x, 200.0, -5.0, RenderConfig())
    assert snr_db(ref, y) > 60


def test_partitioned_offline_matches_stream(long_table, rng):
    """render_streamed (batched partitioned conv) == Stream.push loop,
    with P=3 partitions and per-block head rotation + crossfade."""
    cfg = RenderConfig(stream_block=128)
    r = BinauralRenderer(long_table, cfg)
    nb = 10
    x = rng.standard_normal(nb * 128)
    dirs = np.stack([np.linspace(20, 340, nb), np.linspace(-40, 90, nb)], axis=1)
    y = np.asarray(r.render_streamed(x, dirs))
    gs = golden.GoldenStream(long_table, cfg)
    ref = np.concatenate(
        [gs.push(x[i * 128 : (i + 1) * 128], *dirs[i]) for i in range(nb)], axis=1)
    assert y.shape == ref.shape == (2, nb * 128)
    assert snr_db(ref, y) > 60


def test_partitioned_offline_default_table(table, rng):
    cfg = RenderConfig(stream_block=256)
    r = BinauralRenderer(table, cfg)
    nb = 6
    x = rng.standard_normal(nb * 256)
    dirs = np.stack([np.linspace(0, 180, nb), np.zeros(nb)], axis=1)
    y = np.asarray(r.render_streamed(x, dirs))
    gs = golden.GoldenStream(table, cfg)
    ref = np.concatenate(
        [gs.push(x[i * 256 : (i + 1) * 256], *dirs[i]) for i in range(nb)], axis=1)
    assert snr_db(ref, y) > 60


def test_brir_length_partitioned_scan(rng):
    """P>8 triggers the memory-bounded scan path; parity vs GoldenStream
    with a 2048-tap BRIR-length filter (P = 17 partitions at B=128)."""
    brir_table = load_hrir_set("synthetic", taps=2048)
    cfg = RenderConfig(stream_block=128)
    assert _n_parts(brir_table, cfg) == 17
    r = BinauralRenderer(brir_table, cfg)
    nb = 20
    x = rng.standard_normal(nb * 128)
    dirs = np.stack([np.linspace(0, 300, nb), np.linspace(-40, 80, nb)], axis=1)
    y = np.asarray(r.render_streamed(x, dirs))
    gs = golden.GoldenStream(brir_table, cfg)
    ref = np.concatenate(
        [gs.push(x[i * 128 : (i + 1) * 128], *dirs[i]) for i in range(nb)], axis=1)
    assert y.shape == ref.shape
    assert snr_db(ref, y) > 60
