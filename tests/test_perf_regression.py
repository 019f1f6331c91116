"""Benchmark-as-test (SURVEY.md §4.5): perf-regression gates.

Skipped by default (the CI suite runs on CPU); run on the real chip with

    TINAURAL_PERF=1 python -m pytest tests/test_perf_regression.py -q

(TINAURAL_TEST_PLATFORM must NOT be cpu for these to mean anything —
they self-skip unless a TPU backend is active.)

The gates encode the ACHIEVED margins, not just the external target
(round-1 VERDICT weak #6: a regression from 2.2× to 1.01× of target used
to pass). Thresholds sit ~25% under the measured medians to absorb the
axon tunnel's documented run-to-run jitter without masking real
regressions.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

RUN = os.environ.get("TINAURAL_PERF") == "1"

pytestmark = pytest.mark.skipif(
    not RUN, reason="perf gates run only with TINAURAL_PERF=1 on TPU")


def _run_group(name: str) -> dict:
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}  # conftest pins CPU
    out = subprocess.run(
        [sys.executable, "bench.py", "--workload", name],
        capture_output=True, text=True, timeout=1700, cwd="/root/repo",
        env=env)
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise RuntimeError(f"no JSON from bench {name}: {out.stderr[-400:]}")


@pytest.fixture(scope="module")
def traj_result():
    return _run_group("traj_group")


@pytest.fixture(scope="module")
def static_result():
    return _run_group("static_group")


@pytest.fixture(scope="module")
def scene_result():
    return _run_group("scene_group")


@pytest.fixture(scope="module")
def stream_result():
    return _run_group("stream_group")


@pytest.fixture(scope="module")
def capacity_result():
    return _run_group("capacity_group")


def _gated(value, floor, group, *path, larger_is_better=True):
    """Assert a throughput/latency floor with a MEDIAN-OF-3 on failure:
    this tunnel's cross-process timings swing up to 4× (docs/BENCH_NOTES.md
    "Measurement reality"), so one outlier run should not fail CI — but a
    best-of-two retake would also let a persistent regression that jitters
    above the floor half the time pass ~75% of runs (round-3 VERDICT weak
    #1). The median of the original + two retakes keeps detection
    monotone: a regression must beat the floor in 2 of 3 runs to pass."""
    ok = value > floor if larger_is_better else value < floor
    if ok:
        return
    vals = [value]
    for _ in range(2):
        res = _run_group(group)
        for k in path:
            res = res[k]
        vals.append(res)
    med = float(np.median(vals))
    if larger_is_better:
        assert med > floor, (vals, floor)
    else:
        assert med < floor, (vals, floor)


def test_trajectory_beats_10000x_with_margin(traj_result):
    """Headline ≥4.5× the 10,000× target — ~50% under the round-4
    official 92.9k (the round-4 routing fix put the headline on the
    single-launch kernel: r3's official was 39.2k BECAUSE the VMEM gate
    silently excluded it; this floor exists to catch exactly that class
    of regression)."""
    _gated(traj_result["traj"]["audio_sec_per_sec"], 45_000,
           "traj_group", "traj", "audio_sec_per_sec")


def test_static_block_path_beats_target(static_result):
    """Config 1 (static render) well above the 10,000× target via the
    block path (round-3 series: 29.7–86.4k; one gate run measured an
    8k tunnel outlier — hence the retake)."""
    _gated(static_result["static"]["audio_sec_per_sec"], 25_000,
           "static_group", "static", "audio_sec_per_sec")


def test_static_direct_fft_beats_target(static_result):
    """The short-render direct-FFT path — below target through round 2
    (6.5k), fixed by packing its transforms (round-3: 24.5–48.4k)."""
    _gated(static_result["static"]["direct_fft_audio_sec_per_sec"], 10_000,
           "static_group", "static", "direct_fft_audio_sec_per_sec")


def test_brir_partitioned_throughput(static_result):
    """2048-tap moving BRIR through the fused partitioned kernel
    (round-3 VERDICT #4 bar: ≥2,000× RT). Floor raised to 3,500 for the
    round-4 in-kernel assembly route (serialized 7,918× on chip vs the
    old route's official 3,035–3,220) so a routing regression back to
    the XLA assembly is caught, while ~50% headroom absorbs tunnel
    swing."""
    _gated(static_result["brir"]["audio_sec_per_sec"], 3_500,
           "static_group", "brir", "audio_sec_per_sec")


def test_scene_aggregates(scene_result):
    """64-source scene aggregates (round-2 VERDICT weak #3: no scene gate
    existed — a 2× regression passed CI). Gates ~50–60% under the r04
    officials (static 260k, moving 182k — the whole-scene single-launch
    route) to absorb tunnel spread while still catching a routing-class
    regression."""
    _gated(scene_result["scene"]["aggregate_audio_sec_per_sec"], 100_000,
           "scene_group", "scene", "aggregate_audio_sec_per_sec")
    _gated(scene_result["scene_moving"]["aggregate_audio_sec_per_sec"],
           70_000, "scene_group", "scene_moving", "aggregate_audio_sec_per_sec")


def test_stream_push_budgets(stream_result):
    """Streaming compute must stay inside the real-time block budget
    (5.805 ms at block 256), and batched pushes must not gross-regress.
    These are the tunnel's jitteriest numbers (r03 runs: 1.2/2.8/4.9 ms
    single, 2.3/2.8/9.8 ms batched-64), so the gates detect regressions,
    not records."""
    _gated(stream_result["stream"]["push_compute_ms"], 5.805,
           "stream_group", "stream", "push_compute_ms",
           larger_is_better=False)
    _gated(stream_result["stream"]["batched64_push_ms"], 15.0,
           "stream_group", "stream", "batched64_push_ms",
           larger_is_better=False)


def test_serving_capacity(capacity_result):
    """Batched-stream serving capacity (round-2 VERDICT weak #5 asked for
    the number), both regimes:

    - sustained (`push_many`, K blocks/dispatch, device-staged audio —
      the chip's serving rate): r04 measured 19.9k–28.1k listeners/chip;
      floor 5,000 leaves the documented 4× cross-process swing.
    - per-block-dispatch (one push + one tunnel h2d per block — the
      host-paced worst case): ≥120, the r02 level; r03–r04 measured
      200–318."""
    _gated(capacity_result["capacity"]["realtime_listeners_per_chip"], 5000,
           "capacity_group", "capacity", "realtime_listeners_per_chip")
    _gated(capacity_result["capacity"][
               "realtime_listeners_per_block_dispatch"], 120,
           "capacity_group", "capacity",
           "realtime_listeners_per_block_dispatch")


def test_parity_gate_on_chip(traj_result):
    """≥60 dB is the BASELINE gate; ≥90 dB is the achieved margin with
    the default 3-pass split-bf16 kernels (kernel_precision="highest"
    restores the ~108 dB full-f32 margin at half the throughput)."""
    assert traj_result["snr"]["snr_db"] >= 90.0


def test_pallas_kernel_parity_on_chip():
    """Round-1 VERDICT weak #2: the COMPILED fused kernel (not just its
    interpret-mode CI test) must agree with the jnp chain on real
    hardware — Mosaic tiling/precision assumptions get a gate. Runs in a
    subprocess because conftest pins the test process itself to CPU."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}  # conftest pins CPU
    out = subprocess.run(
        [sys.executable, "scripts/check_kernel_parity.py"],
        capture_output=True, text=True, timeout=1200, cwd="/root/repo",
        env=env)
    res = None
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            res = json.loads(line)
            break
        except json.JSONDecodeError:
            continue
    assert res, f"no JSON from parity check: {out.stderr[-400:]}"
    assert res["backend"] != "cpu", "parity gate needs the real chip"
    # minimum across all four fused pipelines; ~90+ dB with the default
    # tri kernels (the legacy f32 kernel itself measures 122.8 dB)
    assert res["snr_db"] >= 90.0
