"""Benchmark-as-test (SURVEY.md §4.5): perf-regression gates.

Skipped by default (the CI suite runs on CPU); run on the real chip with

    TINAURAL_PERF=1 python -m pytest tests/test_perf_regression.py -q

(TINAURAL_TEST_PLATFORM must NOT be cpu for these to mean anything —
they self-skip unless a TPU backend is active.)
"""

import json
import os
import subprocess
import sys

import pytest

RUN = os.environ.get("TINAURAL_PERF") == "1"

pytestmark = pytest.mark.skipif(
    not RUN, reason="perf gates run only with TINAURAL_PERF=1 on TPU")


@pytest.fixture(scope="module")
def traj_result():
    out = subprocess.run(
        [sys.executable, "bench.py", "--workload", "traj_group"],
        capture_output=True, text=True, timeout=1700, cwd="/root/repo")
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise RuntimeError(f"no JSON from bench: {out.stderr[-400:]}")


def test_trajectory_beats_10000x(traj_result):
    assert traj_result["traj"]["audio_sec_per_sec"] > 10_000


def test_parity_gate_on_chip(traj_result):
    assert traj_result["snr"]["snr_db"] >= 60.0
