"""tinaural benchmark harness (SURVEY.md §6; BASELINE.json:2 metrics).

Run on the real TPU chip. Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Headline: 1-source moving-render throughput in audio-seconds rendered per
wall-second per chip; vs_baseline = ratio to BASELINE.json:5's 10,000×
real-time target (>1 beats it).

Measurement methodology (documented because the axon tunnel distorts naive
timing two ways, both measured):
  * `block_until_ready` is asynchronous on this backend (a 2048-block
    render "completed" in 20 µs), so completion is fenced by a 1-element
    device→host read (`tinaural.utils.profiling.fence`).
  * Each fence pays a ~30 ms network round trip that a real host-attached
    chip does not, so per-call cost is the *marginal* pipelined cost:
    time K1 calls and K2 calls (device executes in order, one fence per
    batch) and report (t2−t1)/(K2−K1). This is steady-state server
    throughput; the one-shot latency including the RTT is reported in
    extras for reference.
  * Workloads run in separate subprocesses — sharing a process was
    measured to degrade later workloads up to 20× (allocator/tunnel
    contamination).
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time

import numpy as np

# Persistent compilation cache: the subprocess-per-workload isolation would
# otherwise recompile every executable (~60-90 s each over the tunnel).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tinaural_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

TARGET_X_REALTIME = 10_000.0  # BASELINE.json:5
SR = 44_100

# Priming mode (round-3 VERDICT "Next round" #4): before each TIMED group
# subprocess, the driver runs the same group with TINAURAL_BENCH_PRIME=1 —
# every executable compiles (hitting or filling the persistent cache) and
# runs once, but the measurement loops are skipped. The timed subprocess
# then starts with warm caches, so the official capture reflects the
# steady state the builder's own series medians show, not first-run
# compile/allocator ramp.
PRIME = os.environ.get("TINAURAL_BENCH_PRIME") == "1"

# Smoke mode: `python bench.py --smoke` (or TINAURAL_BENCH_SMOKE=1) runs
# EVERY group end-to-end on CPU with tiny shapes and interpreter-mode
# kernels, each executable compiled and run ONCE, untimed. It exists to
# catch import/routing/shape breakage at HEAD before an official on-chip
# capture — round 4's run 5 crashed mid-capture on exactly that class of
# failure (source change landed while the run's later group subprocesses
# were starting; see BENCH_NOTES "bench-methodology note"). All numbers
# printed in smoke mode are meaningless (inf/0) by design; the exit
# criterion is "no group raised".
SMOKE = (os.environ.get("TINAURAL_BENCH_SMOKE") == "1"
         or "--smoke" in sys.argv)
if SMOKE:
    os.environ["TINAURAL_BENCH_SMOKE"] = "1"   # propagate to group procs
    os.environ["TINAURAL_FORCE_INTERPRET"] = "1"
    import jax

    # env alone is overridden by this machine's sitecustomize; the config
    # API wins until backend init (same pattern as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    PRIME = True  # run-once semantics for every timing helper


def _sz(official: int, smoke: int) -> int:
    """A workload size: the official value, or the tiny smoke-mode one."""
    return smoke if SMOKE else official


# --------------------------------------------------------------- workloads
# Each runs in its own subprocess: bench.py --workload NAME prints JSON.


def _fence(y) -> float:
    # the shared pytree-safe fence (1-element d2h; this backend's
    # block_until_ready is async — see utils.profiling.fence)
    from tinaural.utils.profiling import fence

    return fence(y)


def _marginal(call, k1: int = 2, k2: int = 12, reps: int = 5) -> float:
    """Marginal pipelined seconds per call — the shared tunnel-safe
    estimator (positive-median with a conservative fallback); see
    tinaural.utils.profiling.marginal_cost for the full rationale."""
    if PRIME:
        _fence(call())
        return float("inf")
    from tinaural.utils.profiling import marginal_cost

    return marginal_cost(call, k1=k1, k2=k2, reps=reps)


def _route(expected: str, ok) -> dict:
    """Routing proof for a timed workload (round-4 VERDICT weak #2; the
    CLAUDE.md lesson "FIRST confirm which route fired"): ``ok`` is the
    SAME gate the renderer consults, evaluated at the workload's exact
    static shapes — so the official JSON records that the number
    measured the intended architecture. The other way a route silently
    changes (a Mosaic-failure demotion mid-run) is captured per group
    via `vmem.demotion_log()` in the `--workload` branch; the parent
    lifts both into `errors`."""
    return {"expected_route": expected, "route_ok": bool(ok)}


def _render_route(cfg, table, B: int, S: int) -> dict:
    """Route proof for the trajectory/scene workloads: the single-launch
    render kernel must gate on at (taps, n_fft, B, S)."""
    from tinaural.models.renderer import _use_fused_render
    from tinaural.ops.filters import DELAY_PAD, next_pow2

    taps = table.h.shape[-1]
    n_fft = next_pow2(B + taps + DELAY_PAD - 1)
    return _route("fused_render",
                  _use_fused_render(cfg, taps, n_fft, B, S))


def _oneshot(call) -> float:
    def once():
        t0 = time.perf_counter()
        _fence(call())
        return time.perf_counter() - t0

    once()
    if PRIME:
        return float("inf")
    return min(once() for _ in range(3))


# ------------------------------------------------ roofline / MFU accounting
#
# Round-3 VERDICT missing #3: BENCH_NOTES reported µs/block but never
# situated anything against hardware peaks. The MAC counts below are
# STATIC functions of the shapes — the exact matmul inventory of the
# fused block-render pipeline (gather one-hot matmul, the M1/MB/MA zoom
# chain, forward four-step stage 3 incl. the Hermitian mirror, inverse
# four-step stage 1) — so every timed workload can report device TFLOP/s
# and %-of-peak alongside its throughput. Elementwise/VPU work (tile-FFT
# butterflies, twiddles, the MAC itself, ramps) is NOT counted: these are
# MXU-side numbers. Peak: v5e ≈ 197 bf16 TFLOP/s (public spec). "tri"
# kernels issue 3 bf16 MXU passes per f32-equivalent MAC (split-bf16),
# full-f32 matmuls 6 — pct_v5e_bf16_peak uses the pass-weighted count,
# f32_equiv_tflops the plain one.

V5E_BF16_TFLOPS = 197.0


def _render_macs(taps: int, n_fft: int, blocks: int, dir_rate: int = 1,
                 crossfade: bool = True, rows_p: int = 1024) -> dict:
    """Per-call MAC inventory of the fused block-render pipeline.

    `blocks` counts (source, block) pairs for the per-pair stages; the
    inverse runs once per OUTPUT block — pass them via the same number
    for 1-source renders and scale externally for scenes. ``rows_p`` is
    the padded in-kernel gather table (synthetic KEMAR grid: 14x72 =
    1008 directions -> 1024 rows)."""
    n1 = n_fft // 128
    Gh = n1 // 2 + 1
    Fs = Gh * 128
    L = 1
    while L < taps + 64:  # DELAY_PAD = 64
        L *= 2
    FLp = -(-(L // 2 + 1) // 128) * 128
    Tp_p = -(-(taps + 64) // 128) * 128
    taps_p = -(-taps // 128) * 128
    per_pair_tri = (
        rows_p * 2 * taps_p            # gather: one-hot @ HRIR table
        + 2 * taps_p * 2 * FLp         # M1 (2 ear rows)
        + 2 * 2 * FLp * Tp_p           # MB
        + 2 * Tp_p * 2 * Fs            # MA (scrambled rfft)
    ) / dir_rate + (
        4 * Gh * 128 * 128             # forward four-step stage 3
        + (4 * Gh * 128 * 128 if crossfade else 0)  # Hermitian mirror
    )
    per_pair_f32 = rows_p * 128 / dir_rate  # delay/gain gather (HIGHEST)
    per_block_tri = 4 * n1 * 128 * 128      # inverse four-step stage 1
    tri = blocks * (per_pair_tri + per_block_tri)
    f32 = blocks * per_pair_f32
    return {"tri_macs": tri, "f32_macs": f32,
            "flops": 2 * (tri + f32),
            "pass_flops": 2 * (3 * tri + 6 * f32)}


def _roofline(macs: dict, seconds: float) -> dict:
    if not np.isfinite(seconds) or seconds <= 0:
        return {}
    return {
        "device_ms_per_call": round(seconds * 1e3, 3),
        "f32_equiv_tflops": round(macs["flops"] / seconds / 1e12, 2),
        "pct_v5e_bf16_peak": round(
            100.0 * macs["pass_flops"] / seconds / (V5E_BF16_TFLOPS * 1e12), 1),
    }


def w_trajectory() -> dict:
    """1-source moving render, 2^23 samples (~190 s audio), block 1024 —
    THE headline (the number of record). Measured alone, fused route
    only, before anything else runs in its process: its methodology must
    stay comparable round-over-round (round-4 series 92.9–99.9k).

    Round-4 workload-size note: rounds 1–3 used 2^21 samples. The round-4
    kernel renders that in ~0.40 ms of device time — UNDER this tunnel's
    ~0.6–1 ms per-dispatch floor, so the pipelined marginal was measuring
    the tunnel, not the chip (43.6k capped vs 119k device-limited,
    both measured 2026-08-17). The metric is audio-seconds/sec/chip
    (throughput); 2^23 keeps each dispatch ~1.6 ms of real device work so
    the official number tracks the hardware. The serialized in-jit
    device time is cross-checked in extras (device_ms_per_call)."""
    import jax
    from tinaural.config import RenderConfig
    from tinaural.data import load_hrir_set
    from tinaural.models import BinauralRenderer
    from tinaural.models.renderer import _trajectory_fn

    N, B = _sz(1 << 23, 1 << 15), 1024
    cfg = RenderConfig(block_size=B)
    r = BinauralRenderer(load_hrir_set("synthetic"), cfg)
    rng = np.random.default_rng(0)
    nb = N // B
    xb = jax.device_put(rng.standard_normal((nb, B)).astype(np.float32))
    dirs = jax.device_put(
        np.stack([np.linspace(0, 350, nb) % 360,
                  40 * np.sin(np.linspace(0, 20, nb))], axis=1).astype(np.float32))
    call = lambda: _trajectory_fn(r.table, xb, dirs, cfg)
    # the headline gets extra sampling: it is the official record and the
    # tunnel's per-estimate jitter shrinks with k2−k1 and rep count
    per = _marginal(call, k1=4, k2=24, reps=7)
    out = {
        "audio_sec_per_sec": (N / SR) / per,
        "oneshot_ms_incl_rtt": _oneshot(call) * 1e3,
    }
    taps = r.table.h.shape[-1]  # derive, don't hardcode (review finding)
    from tinaural.ops.filters import DELAY_PAD, next_pow2

    n_fft = next_pow2(B + taps + DELAY_PAD - 1)
    out.update(_roofline(_render_macs(taps, n_fft, nb), per))
    out["route"] = _render_route(cfg, r.table, B, 1)
    return out


def w_traj_ab() -> dict:
    """Fused kernel vs pure-XLA fallback on the headline workload, the
    two legs INTERLEAVED in one process (marginal_cost_ab). Runs AFTER
    the headline in traj_group: the previous sequential structure ran
    the XLA leg second and in-process drift systematically inflated the
    reported kernel advantage (review finding; the round-2 measured
    up-to-35% later-workload slowdown). The headline above keeps its
    round-comparable single-leg methodology; THIS is the speedup claim."""
    import jax
    from tinaural.config import RenderConfig
    from tinaural.data import load_hrir_set
    from tinaural.models import BinauralRenderer
    from tinaural.models.renderer import _trajectory_fn

    N, B = _sz(1 << 23, 1 << 15), 1024
    cfg = RenderConfig(block_size=B)
    cfg_x = RenderConfig(block_size=B, use_pallas=False)
    r = BinauralRenderer(load_hrir_set("synthetic"), cfg)
    rng = np.random.default_rng(0)
    nb = N // B
    xb = jax.device_put(rng.standard_normal((nb, B)).astype(np.float32))
    dirs = jax.device_put(
        np.stack([np.linspace(0, 350, nb) % 360,
                  40 * np.sin(np.linspace(0, 20, nb))],
                 axis=1).astype(np.float32))
    legs = {"fused": lambda: _trajectory_fn(r.table, xb, dirs, cfg),
            "xla": lambda: _trajectory_fn(r.table, xb, dirs, cfg_x)}
    if PRIME:
        for c in legs.values():
            _fence(c())
        per = {n: float("inf") for n in legs}
    else:
        from tinaural.utils.profiling import marginal_cost_ab

        per = marginal_cost_ab(legs, k1=2, k2=10, reps=4)
    out = {"audio_sec_per_sec": (N / SR) / per["xla"],
           "fused_interleaved_audio_sec_per_sec": (N / SR) / per["fused"]}
    if np.isfinite(per["fused"]) and per["fused"] > 0:
        out["fused_over_xla"] = round(per["xla"] / per["fused"], 2)
    return out


def w_traj_dir4() -> dict:
    """w_trajectory with the HRTF updated every 4th block (92.9 ms) —
    the RenderConfig.dir_rate lever. Own subprocess group: measured
    in-process AFTER the dir_rate=1 sibling it read up to 35% slow
    (workload-mixing contamination, round-2 finding)."""
    import jax
    from tinaural.config import RenderConfig
    from tinaural.data import load_hrir_set
    from tinaural.models import BinauralRenderer
    from tinaural.models.renderer import _trajectory_fn

    N, B = _sz(1 << 23, 1 << 15), 1024
    cfg = RenderConfig(block_size=B, dir_rate=4)
    r = BinauralRenderer(load_hrir_set("synthetic"), cfg)
    rng = np.random.default_rng(0)
    nb = N // B
    xb = jax.device_put(rng.standard_normal((nb, B)).astype(np.float32))
    dirs = jax.device_put(
        np.stack([np.linspace(0, 350, nb) % 360,
                  40 * np.sin(np.linspace(0, 20, nb))],
                 axis=1).astype(np.float32))
    per = _marginal(lambda: _trajectory_fn(r.table, xb, dirs, cfg),
                    k1=4, k2=16, reps=5)
    out = {"audio_sec_per_sec": (N / SR) / per}
    from tinaural.ops.filters import DELAY_PAD, next_pow2

    taps = r.table.h.shape[-1]
    n_fft = next_pow2(B + taps + DELAY_PAD - 1)
    out.update(_roofline(_render_macs(taps, n_fft, nb, dir_rate=4), per))
    out["route"] = _render_route(cfg, r.table, B, 1)
    return out


def w_scene_moving_dir4() -> dict:
    """64 moving sources at dir_rate=4 (own group — see w_traj_dir4)."""
    import jax
    from tinaural.config import RenderConfig
    from tinaural.data import load_hrir_set
    from tinaural.models import BinauralRenderer
    from tinaural.models.renderer import _scene_fn

    S, N, B = _sz(64, 8), _sz(1 << 17, 1 << 14), 1024
    cfg = RenderConfig(block_size=B, dir_rate=4)
    r = BinauralRenderer(load_hrir_set("synthetic"), cfg)
    rng = np.random.default_rng(2)
    nb = N // B
    xbs = jax.device_put(rng.standard_normal((S, nb, B)).astype(np.float32))
    dirs = jax.device_put(np.stack(
        [rng.uniform(0, 360, (S, nb)), rng.uniform(-40, 90, (S, nb))],
        axis=-1).astype(np.float32))
    per = _marginal(lambda: _scene_fn(r.table, xbs, dirs, cfg), 1, 5)
    return {"aggregate_audio_sec_per_sec": S * (N / SR) / per,
            "route": _render_route(cfg, r.table, B, S)}


def w_scene256() -> dict:
    """256 moving sources, ~1.5 s audio each — the larger-scale serving
    point (the single-launch scene kernel's per-source VMEM carry is the
    only thing that grows with S)."""
    import jax
    from tinaural.config import RenderConfig
    from tinaural.data import load_hrir_set
    from tinaural.models import BinauralRenderer
    from tinaural.models.renderer import _scene_fn

    S, N, B = _sz(256, 16), _sz(1 << 16, 1 << 14), 1024
    cfg = RenderConfig(block_size=B)
    r = BinauralRenderer(load_hrir_set("synthetic"), cfg)
    rng = np.random.default_rng(9)
    nb = N // B
    xbs = jax.device_put(rng.standard_normal((S, nb, B)).astype(np.float32))
    dirs = jax.device_put(np.stack(
        [rng.uniform(0, 360, (S, nb)), rng.uniform(-40, 90, (S, nb))],
        axis=-1).astype(np.float32))
    per = _marginal(lambda: _scene_fn(r.table, xbs, dirs, cfg), 1, 5)
    return {"aggregate_audio_sec_per_sec": S * (N / SR) / per,
            "route": _render_route(cfg, r.table, B, S)}


def w_scene_choir() -> dict:
    """64 moving sources sharing 8 direction tracks (choir/ambience) —
    the `render_scene(dedupe=True)` lever: identical snapped tracks are
    pre-mixed on the host (exact by linearity) so the kernel renders 8
    sources instead of 64. Both regimes are timed INTERLEAVED in one
    process (`marginal_cost_ab` — the only trustworthy A/B form on this
    tunnel per BENCH_NOTES); aggregates count the FULL 64
    sources' audio either way — dedupe delivers the same scene for ~1/8
    the gather+assembly+MAC work. Round-4 roofline said the moving scene
    is compute-bound at 78% of bf16 peak, so only FLOP cuts move it."""
    import jax
    from tinaural.config import RenderConfig
    from tinaural.data import load_hrir_set
    from tinaural.models import BinauralRenderer
    from tinaural.models.renderer import _dedupe_sources, _scene_fn

    S, U, N, B = _sz(64, 8), _sz(8, 2), _sz(1 << 17, 1 << 14), 1024
    cfg = RenderConfig(block_size=B)
    r = BinauralRenderer(load_hrir_set("synthetic"), cfg)
    rng = np.random.default_rng(14)
    nb = N // B
    xs = rng.standard_normal((S, nb * B)).astype(np.float32)
    tracks = np.stack([rng.uniform(0, 360, (U, nb)),
                       rng.uniform(-40, 90, (U, nb))],
                      axis=-1).astype(np.float32)
    dirs = tracks[rng.integers(0, U, S)]

    xs_u, dirs_u = _dedupe_sources(xs, dirs, cfg)
    Ud = int(xs_u.shape[0])
    xd = jax.device_put(xs_u.reshape(-1, nb, B))
    dd = jax.device_put(dirs_u)
    xf = jax.device_put(xs.reshape(S, nb, B))
    df = jax.device_put(dirs)
    calls = {"dedup": lambda: _scene_fn(r.table, xd, dd, cfg),
             "full": lambda: _scene_fn(r.table, xf, df, cfg)}
    if PRIME:
        for c in calls.values():
            _fence(c())
        per = {n: float("inf") for n in calls}
    else:
        from tinaural.utils.profiling import marginal_cost_ab

        per = marginal_cost_ab(calls, k1=1, k2=5)
    # both legs must gate onto the single-launch kernel (they differ in
    # S, which the gate consults) or the A/B compares routes, not FLOPs
    rd = _render_route(cfg, r.table, B, Ud)
    rf = _render_route(cfg, r.table, B, S)
    return {
        "dedup_rendered_sources": Ud,
        "aggregate_audio_sec_per_sec": S * (N / SR) / per["dedup"],
        "nodedup_aggregate_audio_sec_per_sec": S * (N / SR) / per["full"],
        "route": _route("fused_render_dedup+full",
                        rd["route_ok"] and rf["route_ok"]),
    }


def w_scene() -> dict:
    """64-source static scene, 2^18 samples/source (~5.9 s audio each)."""
    import jax
    from tinaural.config import RenderConfig
    from tinaural.data import load_hrir_set
    from tinaural.models import BinauralRenderer
    from tinaural.models.renderer import _scene_static_fn

    S, N, B = _sz(64, 8), _sz(1 << 18, 1 << 14), 1024
    cfg = RenderConfig(block_size=B)
    r = BinauralRenderer(load_hrir_set("synthetic"), cfg)
    rng = np.random.default_rng(1)
    nb = N // B
    xbs = jax.device_put(rng.standard_normal((S, nb, B)).astype(np.float32))
    dirs = jax.device_put(
        np.stack([rng.uniform(0, 360, S), rng.uniform(-40, 90, S)],
                 axis=1).astype(np.float32))
    call = lambda: _scene_static_fn(r.table, xbs, dirs, cfg)
    per = _marginal(call, 1, 5)
    return {"aggregate_audio_sec_per_sec": S * (N / SR) / per,
            "route": _render_route(cfg, r.table, B, S)}


def w_scene_moving() -> dict:
    """64 moving sources (per-block HRTF updates + crossfade)."""
    import jax
    from tinaural.config import RenderConfig
    from tinaural.data import load_hrir_set
    from tinaural.models import BinauralRenderer
    from tinaural.models.renderer import _scene_fn

    S, N, B = _sz(64, 8), _sz(1 << 17, 1 << 14), 1024
    cfg = RenderConfig(block_size=B)
    r = BinauralRenderer(load_hrir_set("synthetic"), cfg)
    rng = np.random.default_rng(2)
    nb = N // B
    xbs = jax.device_put(rng.standard_normal((S, nb, B)).astype(np.float32))
    # physical geometry: az wraps 0-360, el spans the KEMAR -40..90 range
    # (round-3 VERDICT weak #5: uniform(0,360) elevations clamped to the
    # top ring)
    dirs = jax.device_put(np.stack(
        [rng.uniform(0, 360, (S, nb)), rng.uniform(-40, 90, (S, nb))],
        axis=-1).astype(np.float32))
    call = lambda: _scene_fn(r.table, xbs, dirs, cfg)
    per = _marginal(call, 1, 5)
    out = {"aggregate_audio_sec_per_sec": S * (N / SR) / per,
           "route": _render_route(cfg, r.table, B, S)}
    from tinaural.ops.filters import DELAY_PAD, next_pow2

    taps = r.table.h.shape[-1]
    n_fft = next_pow2(B + taps + DELAY_PAD - 1)
    macs = _render_macs(taps, n_fft, S * nb)
    # the inverse runs once per OUTPUT block, not per (source, block)
    inv = 2 * 3 * (S - 1) * nb * 4 * (n_fft // 128) * 128 * 128
    macs["pass_flops"] -= inv
    macs["flops"] -= inv // 3
    out.update(_roofline(macs, per))
    return out


def w_static() -> dict:
    """1-source static render.

    Long static renders route through the OLA block path (the public
    `render` does this above 8 blocks — round-1's monolithic-FFT path
    measured 3x slower and below target); the direct full-signal FFT
    variant is reported alongside for the short-render regime.
    """
    import jax
    import jax.numpy as jnp
    from tinaural.config import RenderConfig
    from tinaural.data import load_hrir_set
    from tinaural.models import BinauralRenderer
    from tinaural.models.renderer import (_static_block_fn, _static_fn,
                                          next_pow2)

    # 2^22 (was 2^20 through round 3): keeps the per-dispatch device time
    # above the tunnel's ~0.6-1 ms dispatch floor (see w_trajectory).
    N = _sz(1 << 22, 1 << 15)
    cfg = RenderConfig()
    r = BinauralRenderer(load_hrir_set("synthetic"), cfg)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(N).astype(np.float32)

    nb = N // cfg.block_size
    xb = jax.device_put(x.reshape(nb, cfg.block_size))
    dir2 = jax.device_put(np.array([123.4, 5.6], np.float32))
    per = _marginal(lambda: _static_block_fn(r.table, xb, dir2, cfg))

    n = next_pow2(N + r.t_eff - 1)
    xp = np.zeros(n, np.float32)
    xp[:N] = x
    xd = jax.device_put(xp)
    az, el = jnp.float32(123.4), jnp.float32(5.6)
    per_direct = _marginal(lambda: _static_fn(r.table, xd, az, el, cfg, n))
    # route proof: the static block path assembles ONE filter and runs
    # XLA forward FFTs by design — its fused component is the
    # inverse+OLA epilogue (review finding: this workload had no proof)
    from tinaural.models.renderer import _use_fused_epilogue
    from tinaural.ops.filters import DELAY_PAD

    n_fft = next_pow2(cfg.block_size + r.table.h.shape[-1] + DELAY_PAD - 1)
    return {"audio_sec_per_sec": (N / SR) / per,
            "direct_fft_audio_sec_per_sec": (N / SR) / per_direct,
            "route": _route("fused_epilogue",
                            _use_fused_epilogue(cfg, n_fft,
                                                cfg.block_size))}


def w_brir() -> dict:
    """BRIR-length moving render: 2048-tap filters through the fused
    partitioned kernel (P=5 at block 512) — the workload the whole-filter
    block path cannot touch (frame stays 2·stream_block regardless of
    filter length). Block 512 ≈ 11.6 ms latency: an offline/near-line
    operating point; the hard-latency point is the stream benchmarks'
    block 256."""
    import jax
    from tinaural.config import RenderConfig
    from tinaural.data import load_hrir_set
    from tinaural.models import BinauralRenderer
    from tinaural.models.renderer import _partitioned_fn

    B = 512
    cfg = RenderConfig(stream_block=B)
    r = BinauralRenderer(load_hrir_set("synthetic", taps=2048), cfg)
    rng = np.random.default_rng(6)
    # 2^20 (2^19 through most of round 4, 2^17 through round 3): the
    # in-kernel assembly route cut the call to ~1 ms at 2^19 — back
    # inside the tunnel's ~0.6-1 ms dispatch floor the size exists to
    # stay above (see w_trajectory) — so the size doubles again.
    N = _sz(1 << 20, 1 << 14)
    nb = N // B
    xb = jax.device_put(rng.standard_normal((nb, B)).astype(np.float32))
    dirs = jax.device_put(
        np.stack([np.linspace(0, 350, nb) % 360,
                  20 * np.sin(np.linspace(0, 9, nb))], axis=1).astype(np.float32))
    per = _marginal(lambda: _partitioned_fn(r.table, xb, dirs, cfg), 1, 5)
    out = {"audio_sec_per_sec": (N / SR) / per}
    # dir_rate=4 operating point (HRTF updated every 46 ms): the round-5
    # in-kernel unique-assembly fast path cuts the assembly chain 4×.
    # Measured after the dir1 number in the same process (secondary
    # extra; cross-check against an isolated run before adopting).
    cfg4 = RenderConfig(stream_block=B, dir_rate=4)
    per4 = _marginal(lambda: _partitioned_fn(r.table, xb, dirs, cfg4), 1, 5)
    out["dir4_audio_sec_per_sec"] = (N / SR) / per4
    # expected route: the in-kernel-assembly partitioned kernel (default
    # part_assembly="kernel"; P=5 > 4 keeps use_mm off on this shape),
    # and for the dir4 extra additionally the unique-assembly fast path
    # (k_dir silently resets to 1 when 4 ∤ nb — the proof must catch
    # that, since no demotion fires for it)
    from tinaural.models.renderer import _use_fused_partitioned
    from tinaural.ops import vmem
    from tinaural.ops.filters import DELAY_PAD

    taps = r.table.h.shape[-1]
    P = -(-(taps + DELAY_PAD) // B)
    # mirror _partitioned_core's FULL asm gate, including the use_mm
    # branch it consults first (filter_path="matmul" defers to the fft
    # chain only at P>4 — if a future shape change makes P<=4, the
    # production route is fused_partitioned_step, not asm, and this
    # proof must say so)
    use_mm = (cfg.filter_path == "hybrid"
              or (cfg.filter_path == "matmul" and P <= 4))
    asm_ok = (_use_fused_partitioned(cfg, B, P)
              and not use_mm
              and cfg.part_assembly == "kernel"
              and vmem.fits_partitioned_asm(taps, B, P))
    out["route"] = _route("partitioned_asm+dir4_unique",
                          asm_ok and nb % 4 == 0)
    # CONV-CORE-ONLY MAC model: fwd four-step stage 3 + the crossfade
    # pair of inverse four-steps. On the timed route (part_assembly=
    # "kernel") the whole filter-assembly chain — rfft_L, inverse-L,
    # P segment transforms, scramble — ALSO runs in-kernel on the MXU
    # and is NOT counted here (review finding: the old comment said
    # "XLA-side assembly not counted", which stopped being true when
    # assembly moved in-kernel). The %-peak extra is therefore a LOWER
    # bound on the kernel's MXU utilisation, and dir1-vs-dir4 read
    # identical FLOPs here even though dir4 skips 3/4 of the
    # (uncounted) assembly. Kept as-is for round-over-round
    # comparability; treat it as "conv-core floor", not utilisation.
    n1p = (2 * B) // 128
    ghp = n1p // 2 + 1
    tri = nb * (4 * ghp + 2 * 4 * n1p) * 128 * 128
    out.update(_roofline(
        {"flops": 2 * tri, "pass_flops": 2 * 3 * tri}, per))
    return out


def _batched_push_cost(bs, blocks, azs, els) -> float:
    """Pipelined marginal seconds per BatchedStream.push (pushes chain
    through the carried state, one fence per batch) — the shared
    estimator of tinaural.utils.profiling.marginal_cost (one place to
    calibrate; review finding: three local copies had already drifted)."""
    return _marginal(lambda: bs.push(blocks, azs, els), k1=4, k2=16,
                     reps=3)


def _push_many_cost(bs, blocks, azs, els) -> float:
    """Pipelined marginal seconds per BLOCK via `push_many` (K blocks
    per dispatch, device-staged inputs, one fence per call) — shared
    marginal_cost estimator, divided by the K blocks each call serves."""
    K = blocks.shape[0]
    return _marginal(lambda: bs.push_many(blocks, azs, els),
                     k1=1, k2=4, reps=3) / K


def w_capacity() -> dict:
    """Serving-capacity curve (round-2 VERDICT weak #5) at S ∈ {256,
    1024} listeners per launch, two regimes per point:

    - ``push_ms_S``: pipelined marginal per single-block `push` — one
      dispatch and one host→device audio transfer per block. Through
      this tunnel the number is bound by that transfer (~50 MB/s ⇒
      ~21 ms at S=1024 vs 0.13 ms of chip time — BENCH_NOTES round 4),
      so it is the host-paced worst case, kept for round-over-round
      continuity.
    - ``sustained_push_ms_S``: per-block cost via `push_many` (K=32
      state-chained blocks per dispatch, device-staged audio, per-block
      direction updates, one fence) — the chip's sustained serving rate,
      which is what a host-attached deployment sees (1 MB/block of h2d
      is ~10 µs on PCIe, noise).

    Real-time capacity per chip = max_S S·(block_audio)/push_time on the
    sustained number; the per-dispatch capacity is reported alongside as
    ``realtime_listeners_per_block_dispatch``."""
    import jax

    from tinaural.config import RenderConfig
    from tinaural.data import load_hrir_set
    from tinaural.models import BatchedStream

    B, K = 256, _sz(32, 4)
    table = load_hrir_set("synthetic")
    out = {}
    for S in (256, 1024) if not SMOKE else (8, 16):
        bs = BatchedStream(table, S, RenderConfig(stream_block=B))
        rngb = np.random.default_rng(8)
        blocks = rngb.standard_normal((S, B)).astype(np.float32)
        azs = np.linspace(0, 350, S).astype(np.float32)
        els = np.zeros(S, np.float32)
        per = _batched_push_cost(bs, blocks, azs, els)
        out[f"push_ms_{S}"] = per * 1e3
        out[f"aggregate_{S}"] = S * (B / SR) / per
        # sustained regime: K queued blocks/listener, slowly moving heads
        bs2 = BatchedStream(table, S, RenderConfig(stream_block=B))
        mblocks = jax.device_put(
            rngb.standard_normal((K, S, B)).astype(np.float32))
        mazs = jax.device_put(
            (azs[None] + 2.0 * np.arange(K, dtype=np.float32)[:, None])
            % 360.0)
        mels = jax.device_put(np.broadcast_to(els, (K, S)).copy())
        per_s = _push_many_cost(bs2, mblocks, mazs, mels)
        out[f"sustained_push_ms_{S}"] = per_s * 1e3
        out[f"sustained_aggregate_{S}"] = S * (B / SR) / per_s
    out["realtime_listeners_per_chip"] = max(
        v for k, v in out.items() if k.startswith("sustained_aggregate_"))
    out["realtime_listeners_per_block_dispatch"] = max(
        v for k, v in out.items() if k.startswith("aggregate_"))

    # BRIR serving: 2048-tap per-listener filters through the streaming
    # step's in-kernel assembly mode (round-4 late — these shapes
    # previously fell back to the XLA step; the zoom matrices are
    # ~100 MB and can never ride VMEM). Sustained regime only: K=8
    # blocks/dispatch = 46 ms added latency, inside a room-rendering
    # budget.
    Sb, Kb = _sz(64, 8), _sz(8, 2)
    bt = load_hrir_set("synthetic", taps=2048)
    bsb = BatchedStream(bt, Sb, RenderConfig(stream_block=B))
    rngc = np.random.default_rng(11)
    mb = jax.device_put(
        rngc.standard_normal((Kb, Sb, B)).astype(np.float32))
    maz = jax.device_put((np.linspace(0, 350, Sb, dtype=np.float32)[None]
                          + 2.0 * np.arange(Kb, dtype=np.float32)[:, None])
                         % 360.0)
    mel = jax.device_put(np.zeros((Kb, Sb), np.float32))
    # BRIR serving at k=1 vs stream_update_rate=4 (round 5): at k=4,
    # filters reassemble every 4th push (still a 23 ms head-tracking
    # cadence); held pushes run the no-assembly hold kernel, skipping
    # the in-kernel FFT-assembly chain that dominates the k=1 per-push
    # cost. Same staged inputs — held pushes ignore their directions by
    # contract. The two legs are INTERLEAVED in one process
    # (marginal_cost_ab): sequential per-leg medians are untrustworthy
    # under the documented in-process drift, and this pair is the
    # round's lever A/B (review finding).
    bsb4 = BatchedStream(
        bt, Sb, RenderConfig(stream_block=B, stream_update_rate=4))
    legs = {"k1": lambda: bsb.push_many(mb, maz, mel),
            "k4": lambda: bsb4.push_many(mb, maz, mel)}
    if PRIME:
        for c in legs.values():
            _fence(c())
        per_brir = per_brir4 = float("inf")
    else:
        from tinaural.utils.profiling import marginal_cost_ab

        per_leg = marginal_cost_ab(legs, k1=1, k2=4, reps=3)
        per_brir, per_brir4 = per_leg["k1"] / Kb, per_leg["k4"] / Kb
    out[f"sustained_brir_push_ms_{Sb}"] = per_brir * 1e3
    out["brir_realtime_listeners_per_chip"] = Sb * (B / SR) / per_brir
    out[f"sustained_brir_k4_push_ms_{Sb}"] = per_brir4 * 1e3
    out["brir_k4_realtime_listeners_per_chip"] = Sb * (B / SR) / per_brir4
    from tinaural.ops import vmem

    Smax = 16 if SMOKE else 1024
    out["route"] = _route(
        "stream_zoom+brir_asm",
        vmem.stream_mode(table.h.shape[-1], B, Smax) == "zoom"
        and vmem.stream_mode(bt.h.shape[-1], B, Sb) == "asm")
    return out


def w_stream() -> dict:
    """Streaming push cost (block 256 ≈ 5.8 ms of audio).

    Two numbers: the fenced per-push latency *through this tunnel* (pays a
    ~30 ms network RTT per block that a host-attached chip does not), and
    the pipelined marginal per-push compute cost (pushes chain through the
    carried state, so batching K pushes and fencing once measures pure
    per-block device cost — the number that maps to a real deployment).
    """
    from tinaural.config import RenderConfig
    from tinaural.data import load_hrir_set
    from tinaural.models import Stream

    B = 256
    s = Stream(load_hrir_set("synthetic"), RenderConfig(stream_block=B))
    xb = np.random.default_rng(4).standard_normal(B).astype(np.float32)
    for i in range(5):
        _fence(s.push(xb, 30.0 + i, 0.0))
    if PRIME:
        from tinaural.models import BatchedStream

        Sp = _sz(64, 8)
        bs = BatchedStream(load_hrir_set("synthetic"), Sp,
                           RenderConfig(stream_block=B))
        _batched_push_cost(bs, np.zeros((Sp, B), np.float32),
                           np.zeros(Sp, np.float32), np.zeros(Sp, np.float32))
        from tinaural.ops import vmem

        # the route proof must run in PRIME/smoke too — smoke is the
        # pre-flight that exists to catch a route regression BEFORE an
        # official capture burns 40 min on the wrong architecture
        taps_p = bs.table.h.shape[-1]
        return {"push_compute_ms": float("inf"),
                "push_latency_ms_incl_tunnel_rtt": float("inf"),
                "realtime_budget_ms": B / SR * 1e3,
                "batched64_push_ms": float("inf"),
                "batched64_aggregate_audio_sec_per_sec": float("inf"),
                "route": _route("stream_zoom",
                                vmem.stream_mode(taps_p, B, Sp) == "zoom")}

    # fenced every push: tunnel RTT per block
    t0 = time.perf_counter()
    for i in range(20):
        _fence(s.push(xb, 30.0 + i, 0.0))
    per_rtt = (time.perf_counter() - t0) / 20
    # pipelined: state-chained pushes, one fence per batch — the shared
    # marginal estimator, with the head still rotating per push
    ctr = {"i": 0}

    def one_push():
        ctr["i"] += 1
        return s.push(xb, 30.0 + ctr["i"] % 40, 0.0)

    per_compute = _marginal(one_push, k1=10, k2=50, reps=3)

    # Serving mode: 64 listeners advance one block per fused launch.
    from tinaural.models import BatchedStream

    S = 64
    bs = BatchedStream(load_hrir_set("synthetic"), S,
                       RenderConfig(stream_block=B))
    rngb = np.random.default_rng(7)
    blocks = rngb.standard_normal((S, B)).astype(np.float32)
    azs = np.linspace(0, 350, S).astype(np.float32)
    els = np.zeros(S, np.float32)

    per_b = _batched_push_cost(bs, blocks, azs, els)
    from tinaural.ops import vmem

    taps = bs.table.h.shape[-1]
    return {"push_compute_ms": per_compute * 1e3,
            "push_latency_ms_incl_tunnel_rtt": per_rtt * 1e3,
            "realtime_budget_ms": B / SR * 1e3,
            "batched64_push_ms": per_b * 1e3,
            "batched64_aggregate_audio_sec_per_sec": S * (B / SR) / per_b,
            "route": _route("stream_zoom",
                            vmem.stream_mode(taps, B, S) == "zoom")}


def w_snr() -> dict:
    """On-device parity probe vs the CPU golden oracle."""
    from tinaural.config import RenderConfig
    from tinaural.data import load_hrir_set
    from tinaural.models import BinauralRenderer
    from tinaural.reference import golden

    cfg = RenderConfig(block_size=1024)
    table = load_hrir_set("synthetic")
    rng = np.random.default_rng(5)
    n_samp = _sz(SR, SR // 8)
    x = rng.standard_normal(n_samp).astype(np.float32)
    nb = -(-n_samp // 1024)
    dirs = np.stack([np.linspace(250, 40, nb) % 360,
                     np.linspace(-30, 70, nb)], axis=1)
    y = np.asarray(BinauralRenderer(table, cfg).render_trajectory(x, dirs),
                   dtype=np.float64)
    ref = golden.render_trajectory(table, np.asarray(x, np.float64), dirs, cfg)
    snr = 10.0 * np.log10(np.sum(ref**2) / np.sum((ref - y) ** 2))
    return {"snr_db": float(snr)}


# Workloads grouped into one subprocess per *group*: full per-workload
# isolation would pay a fresh 1-5 min (remote, uncached) compile each; one
# process per group of similar-footprint workloads keeps the measured
# cross-workload contamination away from the dissimilar ones.
GROUPS = {
    "traj_group": [
        ("traj", w_trajectory),
        ("traj_xla", w_traj_ab),
        ("snr", w_snr),
    ],
    "scene_group": [
        ("scene", w_scene),
        ("scene_moving", w_scene_moving),
    ],
    "scale_group": [
        ("traj_dir4", w_traj_dir4),
        ("scene_moving_dir4", w_scene_moving_dir4),
        ("scene256", w_scene256),
        ("scene_choir", w_scene_choir),
    ],
    "static_group": [("static", w_static), ("brir", w_brir)],
    "stream_group": [("stream", w_stream)],
    "capacity_group": [("capacity", w_capacity)],
}


def _run_group(name: str, prime: bool = False) -> dict:
    env = dict(os.environ)
    if prime:
        env["TINAURAL_BENCH_PRIME"] = "1"
    out = subprocess.run(
        [sys.executable, __file__, "--workload", name],
        capture_output=True, text=True, timeout=2400, env=env,
        cwd="/root/repo" if __file__.startswith("/root/repo") else None)
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise RuntimeError(f"group {name} produced no JSON: "
                       f"stdout={out.stdout[-500:]} stderr={out.stderr[-500:]}")


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--workload":
        group = {}
        for key, fn in GROUPS[sys.argv[2]]:
            group[key] = fn()
        from tinaural.ops import vmem

        group["_demotions"] = vmem.demotion_log()
        print(json.dumps(group))
        return

    import jax  # parent process only reports the backend

    res = {}
    errors = {}
    if not SMOKE:
        # Probe the TPU tunnel before running groups: a dead tunnel makes
        # jax backend init HANG (not error), so without this every group
        # subprocess would burn its full 2400 s timeout (~4 h of silence)
        # before the error line appears. 300 s per attempt is ~10× the
        # healthy-tunnel init time. Round-4 lesson (VERDICT weak #1): the
        # probe was ONE-SHOT, and a transient tunnel flap zeroed the
        # round's entire official record — so retry with backoff before
        # declaring the round dead, and say how long we tried. Window:
        # ~12 min of backoff when probes FAIL fast, up to ~37 min when
        # the tunnel HANGS (5 × 300 s subprocess timeouts on top — the
        # documented hang mode is exactly why each probe is capped). The
        # memory-documented failure mode (transient FAILED_PRECONDITION
        # / stalls that vanish on a fresh process) makes each retry a
        # fresh subprocess.
        t_probe = time.perf_counter()
        last_err = None
        for attempt, backoff in enumerate((0, 60, 120, 240, 300), 1):
            time.sleep(backoff)
            try:
                subprocess.run(
                    [sys.executable, "-c",
                     "import jax; assert jax.devices()"],
                    capture_output=True, timeout=300, check=True)
                last_err = None
                break
            except Exception as e:
                last_err = type(e).__name__
        if last_err is not None:
            errors["backend_probe"] = (
                f"device backend unreachable ({last_err} on all 5 "
                f"attempts over {time.perf_counter() - t_probe:.0f} s "
                "with 0/60/120/240/300 s backoff); no groups were run")
    routes = {}
    for gname in GROUPS if not errors else ():
        try:
            if not SMOKE:  # priming pass: compile/warm untimed
                try:
                    _run_group(gname, prime=True)
                except Exception:
                    pass  # best-effort; the timed run still compiles
            g = _run_group(gname)
            # Route accountability (round-4 VERDICT weak #2): a group that
            # silently demoted mid-run, or whose expected route never
            # gated on, must be loud in the official record — the numbers
            # stay (they are real), but `errors` marks what they measured.
            demoted = g.pop("_demotions", [])
            if demoted:
                errors[f"demoted_{gname}"] = "; ".join(demoted)[:300]
            for wl, data in g.items():
                ri = data.pop("route", None) if isinstance(data, dict) else None
                if ri is None:
                    continue
                routes[wl] = ri["expected_route"] + (
                    "" if ri["route_ok"] else ":GATE_MISSED")
                if not ri["route_ok"]:
                    errors[f"route_{wl}"] = (
                        f"expected {ri['expected_route']} route did not "
                        "gate on at the workload shapes")
            res.update(g)
        except Exception as e:  # keep the headline line printable even if
            errors[gname] = str(e)[:200]  # a group times out on the tunnel
    def get(*path, scale=1.0, nd=1):
        cur = res
        for k in path:
            if not isinstance(cur, dict) or k not in cur:
                return None
            cur = cur[k]
        return round(cur * scale, nd)

    traj = get("traj", "audio_sec_per_sec")
    extras = {
        # xla fallback + the kernel speedup, both legs interleaved in one
        # process (w_traj_ab) — the trustworthy A/B on this tunnel
        "1src_trajectory_xla_fallback": get("traj_xla", "audio_sec_per_sec"),
        "trajectory_fused_over_xla": get("traj_xla", "fused_over_xla",
                                         nd=2),
        "1src_trajectory_dir_rate4": get("traj_dir4", "audio_sec_per_sec"),
        "64src_moving_dir_rate4_aggregate": get(
            "scene_moving_dir4", "aggregate_audio_sec_per_sec"),
        "256src_moving_scene_aggregate": get(
            "scene256", "aggregate_audio_sec_per_sec"),
        # choir lever (render_scene dedupe): same 64-source scene, 8
        # shared tracks — dedup vs full, one process
        "64src_choir8_dedup_aggregate": get(
            "scene_choir", "aggregate_audio_sec_per_sec"),
        "64src_choir8_nodedup_aggregate": get(
            "scene_choir", "nodedup_aggregate_audio_sec_per_sec"),
        # roofline (docs/BENCH_NOTES.md "Roofline accounting"): static MAC
        # inventory of the fused pipeline / marginal device seconds
        "headline_device_ms": get("traj", "device_ms_per_call", nd=3),
        "headline_f32_tflops": get("traj", "f32_equiv_tflops", nd=2),
        "headline_pct_v5e_bf16_peak": get("traj", "pct_v5e_bf16_peak"),
        "scene_moving_pct_v5e_bf16_peak": get(
            "scene_moving", "pct_v5e_bf16_peak"),
        "brir_pct_v5e_bf16_peak_kernel_only": get("brir", "pct_v5e_bf16_peak"),
        "1src_static": get("static", "audio_sec_per_sec"),
        "1src_static_direct_fft": get("static", "direct_fft_audio_sec_per_sec"),
        "brir2048_moving": get("brir", "audio_sec_per_sec"),
        "brir2048_moving_dir_rate4": get("brir", "dir4_audio_sec_per_sec"),
        "64src_static_scene_aggregate": get("scene", "aggregate_audio_sec_per_sec"),
        "64src_moving_scene_aggregate": get("scene_moving",
                                            "aggregate_audio_sec_per_sec"),
        "stream_push_compute_ms_block256": get("stream", "push_compute_ms", nd=3),
        "stream_push_latency_ms_incl_tunnel_rtt": get(
            "stream", "push_latency_ms_incl_tunnel_rtt", nd=3),
        "stream_block_audio_ms": get("stream", "realtime_budget_ms", nd=3),
        "stream_batched64_push_ms": get("stream", "batched64_push_ms", nd=3),
        "stream_batched64_aggregate": get(
            "stream", "batched64_aggregate_audio_sec_per_sec"),
        "stream_batched256_push_ms": get("capacity", "push_ms_256", nd=3),
        "stream_batched1024_push_ms": get("capacity", "push_ms_1024", nd=3),
        "stream_sustained256_push_ms": get(
            "capacity", "sustained_push_ms_256", nd=4),
        "stream_sustained1024_push_ms": get(
            "capacity", "sustained_push_ms_1024", nd=4),
        # sustained = push_many(K=32) with device-staged audio: the chip's
        # serving rate (round 4 — the per-dispatch number below is bound
        # by the tunnel's per-push h2d, see BENCH_NOTES)
        "serving_realtime_listeners_per_chip": get(
            "capacity", "realtime_listeners_per_chip"),
        "serving_brir2048_listeners_per_chip": get(
            "capacity", "brir_realtime_listeners_per_chip"),
        # round 5: stream_update_rate=4 — held pushes skip the in-kernel
        # filter-assembly chain (RenderConfig.stream_update_rate)
        "serving_brir2048_k4_listeners_per_chip": get(
            "capacity", "brir_k4_realtime_listeners_per_chip"),
        "serving_listeners_per_block_dispatch": get(
            "capacity", "realtime_listeners_per_block_dispatch"),
        "oneshot_ms_incl_tunnel_rtt": get("traj", "oneshot_ms_incl_rtt"),
        "snr_vs_cpu_golden_db": get("snr", "snr_db"),
        "snr_gate_db": 60.0,
    }
    if routes:
        extras["routes"] = routes  # per-workload routing proof (see _route)
    if traj and extras["64src_static_scene_aggregate"]:
        extras["scene_scaling_vs_1src"] = round(
            extras["64src_static_scene_aggregate"] / traj, 2)
    if errors:
        extras["errors"] = errors
    # Backend NAME via a fresh capped subprocess, never the parent:
    # jax.default_backend() in the parent would init the backend, which
    # HANGS (not errors) on a dead tunnel — and a tunnel that died MID-
    # RUN (probe passed at T0, groups then timed out) would hang right
    # here and the headline JSON line would never print, zeroing the
    # round's record the way round 4's was (review finding).
    if "backend_probe" in errors:
        backend = "unreachable"
    elif SMOKE:
        backend = jax.default_backend()  # parent is pinned to cpu in
        # smoke; a bare subprocess would NOT inherit the pin and would
        # hang on a dead tunnel, failing the pre-flight spuriously
    else:
        try:
            bp = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.default_backend())"],
                capture_output=True, text=True, timeout=300)
            backend = (bp.stdout.strip().splitlines()[-1]
                       if bp.returncode == 0 and bp.stdout.strip()
                       else "unknown")
        except Exception:
            backend = "unreachable_at_end"  # died mid-run; numbers above
            errors["backend_end_probe"] = (  # say which groups survived
                "backend probe failed AFTER the groups ran")
            extras["errors"] = errors  # errors may have been empty before
    result = {
        "metric": "1src_audio_sec_per_sec_per_chip",
        "value": traj if traj is not None else 0.0,
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round((traj or 0.0) / TARGET_X_REALTIME, 3),
        "backend": backend,
        "extras": extras,
    }
    if SMOKE:
        result["smoke"] = True  # numbers are meaningless; pass = no errors

    def finite(v):
        # json.dumps emits spec-invalid `Infinity`/`NaN` tokens for
        # non-finite floats (smoke mode's 0-duration timings; a glitched
        # tunnel marginal could too) — strict parsers reject the line.
        if isinstance(v, float) and not math.isfinite(v):
            return None
        if isinstance(v, dict):
            return {k: finite(x) for k, x in v.items()}
        return v

    print(json.dumps(finite(result)))
    if SMOKE and errors:
        sys.exit(1)  # a pre-flight must fail loudly


if __name__ == "__main__":
    main()
