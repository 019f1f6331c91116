"""The official bench workloads' route gates, evaluated at the OFFICIAL
shapes on CPU (no rendering, no chip).

`bench.py --smoke` proves the route proofs wire through the harness, but
it evaluates them at the tiny smoke shapes — and the round-4 defining
bug was a gate that failed ONLY at the official shapes (the 12 MiB
budget missed the headline shape by 1%, silently re-routing three
rounds of official numbers onto the two-launch pipeline). Every gate is
a pure function of (config, static shapes), so this pins the official
operating points without a device.

Shape constants mirror the `_sz(official, …)` calls in bench.py — if a
workload's official shape changes there, change it here too; the
failure then forces the round-4 lesson ("FIRST confirm which route
fired") to be re-checked at the new shape.

Configs here set ``pallas_interpret=True``: the gates' only
backend-dependent condition is `default_backend() != "tpu" and not
pallas_interpret` (renderer.py), so this neutralizes exactly that term
on the CPU CI backend while every OTHER condition — budgets,
lane alignment, filter_path, part_assembly — evaluates exactly as it
will on the chip (bench's own configs differ only in interpret).
"""

import numpy as np
import pytest

from tinaural.config import RenderConfig
from tinaural.data import load_hrir_set
from tinaural.ops import vmem


@pytest.fixture(scope="module")
def bench():
    import sys

    sys.path.insert(0, "/root/repo")
    import bench as b

    assert not b.SMOKE, "route pinning must see the OFFICIAL sizes"
    return b


def _ok(route: dict) -> bool:
    return route["route_ok"]


def test_trajectory_and_scene_official_routes(bench):
    """Headline + scenes: the single-launch render kernel must gate on
    at (taps=128, B=1024) for S = 1 / 64 / 256 and for the choir's
    deduped 8 — bench.py w_trajectory/w_scene*/w_scene_choir shapes."""
    table = load_hrir_set("synthetic")
    B = 1024
    for cfg in (RenderConfig(block_size=B, pallas_interpret=True),
                RenderConfig(block_size=B, dir_rate=4,
                             pallas_interpret=True)):
        for S in (1, 8, 64, 256):
            assert _ok(bench._render_route(cfg, table, B, S)), (cfg.dir_rate,
                                                                S)


def test_brir_official_route(bench):
    """w_brir (taps=2048, B=512, N=2^20): the in-kernel-assembly
    partitioned route incl. the use_mm branch and the dir4 fast path's
    nb % 4 == 0 requirement."""
    from tinaural.models.renderer import _use_fused_partitioned
    from tinaural.ops.filters import DELAY_PAD

    taps, B, N = 2048, 512, 1 << 20
    cfg = RenderConfig(stream_block=B, pallas_interpret=True)
    P = -(-(taps + DELAY_PAD) // B)
    use_mm = (cfg.filter_path == "hybrid"
              or (cfg.filter_path == "matmul" and P <= 4))
    assert _use_fused_partitioned(cfg, B, P)
    assert not use_mm
    assert cfg.part_assembly == "kernel"
    assert vmem.fits_partitioned_asm(taps, B, P)
    assert (N // B) % 4 == 0


def test_stream_and_capacity_official_routes():
    """w_stream / w_capacity: the zoom streaming kernel at S=64/256/1024
    (taps 128, block 256), the asm mode at the BRIR serving point
    (taps 2048, S=64), and hold-step eligibility at both (the round-5
    update-rate extra serves through fused_stream_hold)."""
    B = 256
    for S in (64, 256, 1024):
        assert vmem.stream_mode(128, B, S) == "zoom", S
    assert vmem.stream_mode(2048, B, 64) == "asm"
    # hold-step chunks exist at both serving points (≥8 = one f32 tile)
    from tinaural.models.streaming import _n_parts

    t_zoom = load_hrir_set("synthetic")
    t_brir = load_hrir_set("synthetic", taps=2048)
    cfg = RenderConfig(stream_block=B)
    assert vmem.stream_hold_chunk(B, _n_parts(t_zoom, cfg), 1024) >= 8
    assert vmem.stream_hold_chunk(B, _n_parts(t_brir, cfg), 64) >= 8
