"""Pallas kernel tests — interpreter mode on CPU (SURVEY.md §4.4: interpret
mode is the kernel sanitizer; compiled execution is exercised on the real
chip by bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tinaural.config import RenderConfig
from tinaural.models import BinauralRenderer
from tinaural.reference import golden

from conftest import snr_db


def test_trajectory_with_pallas_kernel(table, rng):
    """Full trajectory render through the kernel vs the golden oracle."""
    cfg = RenderConfig(block_size=256, use_pallas=True, pallas_interpret=True)
    x = rng.standard_normal(1500)
    nb = -(-1500 // 256)
    dirs = np.stack([np.linspace(0, 300, nb), np.linspace(-30, 60, nb)], axis=1)
    y = np.asarray(BinauralRenderer(table, cfg).render_trajectory(x, dirs))
    ref = golden.render_trajectory(table, x, dirs,
                                   RenderConfig(block_size=256))
    assert snr_db(ref, y) > 60


def test_scene_with_pallas_kernel(table, rng):
    cfg = RenderConfig(block_size=256, use_pallas=True, pallas_interpret=True)
    xs = rng.standard_normal((3, 700))
    dirs = np.stack([rng.uniform(0, 360, 3), rng.uniform(-40, 90, 3)], axis=1)
    y = np.asarray(BinauralRenderer(table, cfg).render_scene(xs, dirs))
    ref = golden.render_scene(table, xs, dirs, RenderConfig(block_size=256))
    assert snr_db(ref, y) > 60


def test_fused_assembly_mac_matches_xla_chain(table, rng):
    """The fused assembly+MAC kernel == filter_spectrum_mm + shifted-H MAC
    (interpret mode), including the first-block and source-boundary
    crossfade convention via the `first` mask."""
    from tinaural.ops.filters import DELAY_PAD, filter_spectrum_mm, next_pow2
    from tinaural.ops.interp import interpolate
    from tinaural.ops.pallas_kernels import fused_assembly_mac

    cfg = RenderConfig()
    taps = np.asarray(table.h).shape[-1]
    B = 256
    n_fft = next_pow2(B + taps + DELAY_PAD - 1)
    nb = 70  # not a multiple of the kernel chunk: exercises padding
    rng_ = np.random.default_rng(11)
    dirs = np.stack([rng_.uniform(0, 360, nb), rng_.uniform(-40, 90, nb)],
                    axis=1).astype(np.float32)
    tbl = jax.device_put(table)
    h, d, g = jax.vmap(lambda a, e: interpolate(tbl, a, e, cfg))(
        jnp.asarray(dirs[:, 0]), jnp.asarray(dirs[:, 1]))
    Xu = jnp.asarray(rng_.standard_normal((nb, n_fft)).astype(np.float32))
    Xd = jnp.asarray(rng_.standard_normal((nb, n_fft)).astype(np.float32))
    Xu = jnp.fft.rfft(Xu)
    Xd = jnp.fft.rfft(Xd)
    # two trajectories flattened: block 37 starts a new source
    first = np.zeros(nb, np.float32)
    first[0] = first[37] = 1.0

    Y = fused_assembly_mac(h, d, g, Xu, Xd, jnp.asarray(first), taps, n_fft,
                           crossfade=True, interpret=True)

    def cplanes(z):  # complex → stacked re/im so snr_db sees both parts
        z = np.asarray(z)
        return np.stack([z.real, z.imag])

    Hc = filter_spectrum_mm(h, d, g, taps, n_fft)  # (nb, 2, F)
    Hp = jnp.concatenate([Hc[:1], Hc[:-1]], axis=0)
    Hp = Hp.at[37].set(Hc[37])
    ref = Xu[:, None, :] * Hc + Xd[:, None, :] * Hp
    assert snr_db(cplanes(ref), cplanes(Y)) > 100

    # no-crossfade variant: Y = Xu·Hc only
    Y2 = fused_assembly_mac(h, d, g, Xu, Xd, jnp.asarray(first), taps, n_fft,
                            crossfade=False, interpret=True)
    ref2 = Xu[:, None, :] * Hc
    assert snr_db(cplanes(ref2), cplanes(Y2)) > 100


def test_fused_stream_step_matches_xla_step(table, rng):
    """The single-launch streaming step == the XLA _step_core, including
    the started-flag crossfade convention and the FDL shift, over several
    chained pushes (interpret mode)."""
    from tinaural.models.streaming import Stream, _step_core, init_state
    from tinaural.ops.interp import interpolate
    from tinaural.ops.pallas_kernels import fused_stream_step

    cfg = RenderConfig(stream_block=256)
    taps = np.asarray(table.h).shape[-1]
    B = cfg.stream_block
    tbl = jax.device_put(table)

    state = init_state(tbl, cfg)
    st_f = jax.tree.map(lambda x: x[None], state)  # S=1 batch for the kernel
    rng_ = np.random.default_rng(3)
    for step in range(3):
        xb = jnp.asarray(rng_.standard_normal(B).astype(np.float32))
        az, el = 30.0 + 40 * step, 5.0 * step
        state, y_ref = jax.jit(
            lambda s, x: _step_core(tbl, s, x, jnp.float32(az),
                                    jnp.float32(el), cfg))(state, xb)

        h, d, g = interpolate(tbl, jnp.float32(az), jnp.float32(el), cfg)
        y, fr, fi, pr, pi = fused_stream_step(
            h[None], d[None], g[None], xb[None], st_f.prev_in,
            st_f.fdl_re[:, :, : B + 1], st_f.fdl_im[:, :, : B + 1],
            st_f.prev_h_re[:, :, :, : B + 1], st_f.prev_h_im[:, :, :, : B + 1],
            st_f.started[None] if st_f.started.ndim == 0 else st_f.started,
            taps, B, crossfade=True, interpret=True)
        st_f = st_f._replace(prev_in=xb[None], fdl_re=fr, fdl_im=fi,
                             prev_h_re=pr, prev_h_im=pi,
                             started=jnp.ones((1,), jnp.float32))

        assert snr_db(np.asarray(y_ref), np.asarray(y[0])) > 90, step
        assert snr_db(np.asarray(state.fdl_re), np.asarray(fr[0])) > 90, step
        assert snr_db(np.asarray(state.prev_h_re), np.asarray(pr[0])) > 80, step


def test_stream_with_fused_step_matches_golden(table, rng):
    """Stream and BatchedStream through the fused step kernel (interpret)
    match GoldenStream push-for-push."""
    from tinaural.models import BatchedStream, Stream

    cfg = RenderConfig(stream_block=256, use_pallas=True,
                       pallas_interpret=True)
    gold = golden.GoldenStream(table, RenderConfig(stream_block=256))
    s = Stream(table, cfg)
    bs = BatchedStream(table, 3, cfg)
    for i in range(4):
        xb = rng.standard_normal(256).astype(np.float32)
        az, el = 20.0 + 50 * i, 10.0 * i - 15
        ref = gold.push(xb.astype(np.float64), az, el)
        y = np.asarray(s.push(xb, az, el))
        assert snr_db(ref, y) > 60, i
        yb = np.asarray(bs.push(np.tile(xb, (3, 1)),
                                np.full(3, az, np.float32),
                                np.full(3, el, np.float32)))
        for k in range(3):
            assert snr_db(ref, yb[k]) > 60, (i, k)


def test_kernel_vmem_gate_falls_back_for_long_filters(rng):
    """512-tap tables overflow the block kernel's VMEM budget at this
    block size; that routing must silently take the jnp path and stay
    correct (use_pallas=True end to end). The STREAM at 512 taps, whose
    zoom matrices also overflow, now routes through the fused step's
    in-kernel-assembly mode instead of falling back — assert that and
    the same golden parity."""
    from tinaural.data import load_hrir_set
    from tinaural.models import Stream
    from tinaural.models.renderer import _use_fused_kernel, next_pow2
    from tinaural.models.streaming import _use_fused_step
    from tinaural.ops.filters import DELAY_PAD
    from tinaural.ops.pallas_kernels import stream_step_vmem_bytes
    from tinaural.ops.vmem import KERNEL_BUDGET

    long_table = load_hrir_set("synthetic", taps=512)
    cfg = RenderConfig(block_size=1024, stream_block=256, use_pallas=True,
                       pallas_interpret=True)
    n_fft = next_pow2(1024 + 512 + DELAY_PAD - 1)
    assert not _use_fused_kernel(cfg, 512, n_fft)
    assert stream_step_vmem_bytes(512, 256, 1) >= KERNEL_BUDGET
    assert _use_fused_step(long_table, cfg, 1)  # asm mode takes over

    x = rng.standard_normal(4 * 1024)
    dirs = np.stack([np.linspace(0, 90, 4), np.zeros(4)], axis=1)
    y = np.asarray(BinauralRenderer(long_table, cfg).render_trajectory(x, dirs))
    ref = golden.render_trajectory(long_table, x, dirs,
                                   RenderConfig(block_size=1024))
    assert snr_db(ref, y) > 60

    s = Stream(long_table, cfg)
    gold = golden.GoldenStream(long_table, RenderConfig(stream_block=256))
    xb = rng.standard_normal(256).astype(np.float32)
    yb = np.asarray(s.push(xb, 45.0, 0.0))
    refb = gold.push(xb.astype(np.float64), 45.0, 0.0)
    assert snr_db(refb, yb) > 60


def test_fused_kernels_at_other_tap_counts(rng):
    """taps=256 gives FL=257 → different lane padding (FLp=384) than the
    standard fixture's 128 taps — both fused kernels must stay correct
    (interpret mode)."""
    from tinaural.data import load_hrir_set
    from tinaural.models import Stream

    t256 = load_hrir_set("synthetic", taps=256)
    cfg = RenderConfig(block_size=512, stream_block=512, use_pallas=True,
                       pallas_interpret=True)
    x = rng.standard_normal(4 * 512)
    dirs = np.stack([np.linspace(0, 120, 4), np.linspace(-20, 40, 4)], axis=1)
    y = np.asarray(BinauralRenderer(t256, cfg).render_trajectory(x, dirs))
    ref = golden.render_trajectory(t256, x, dirs, RenderConfig(block_size=512))
    assert snr_db(ref, y) > 60

    s = Stream(t256, cfg)
    gold = golden.GoldenStream(t256, RenderConfig(stream_block=512))
    for i in range(2):
        xb = rng.standard_normal(512).astype(np.float32)
        yb = np.asarray(s.push(xb, 30.0 + 60 * i, 5.0))
        refb = gold.push(xb.astype(np.float64), 30.0 + 60 * i, 5.0)
        assert snr_db(refb, yb) > 60, i


def test_render_batch_through_kernel(table, rng):
    """render_batch (independent renders, batched epilogue) through the
    fused kernel matches per-source golden trajectories."""
    cfg = RenderConfig(block_size=256, use_pallas=True, pallas_interpret=True)
    r = BinauralRenderer(table, cfg)
    xs = rng.standard_normal((3, 1024))
    dirs = np.stack([rng.uniform(0, 360, (3, 4)),
                     rng.uniform(-40, 90, (3, 4))], axis=2)
    yb = np.asarray(r.render_batch(xs, dirs))
    for k in range(3):
        ref = golden.render_trajectory(table, xs[k], dirs[k],
                                       RenderConfig(block_size=256))
        assert snr_db(ref, yb[k]) > 60, k


def test_batched_stream_multi_chunk_grid(table, rng):
    """A serving batch larger than the kernel's per-step chunk (64)
    grids over stream chunks — every listener must still match an
    independent golden stream (interpret mode; S=70 exercises chunk
    boundary + padding)."""
    from tinaural.models import BatchedStream

    S = 70
    cfg = RenderConfig(stream_block=256, use_pallas=True,
                       pallas_interpret=True)
    bs = BatchedStream(table, S, cfg)
    azs = np.linspace(0, 355, S).astype(np.float32)
    els = np.linspace(-30, 60, S).astype(np.float32)
    golds = [golden.GoldenStream(table, RenderConfig(stream_block=256))
             for _ in range(S)]
    for step in range(2):
        blocks = rng.standard_normal((S, 256)).astype(np.float32)
        y = np.asarray(bs.push(blocks, azs + step, els))
        for s in (0, 1, 63, 64, 69):  # spot-check across chunk boundaries
            ref = golds[s].push(blocks[s].astype(np.float64),
                                azs[s] + step, els[s])
            assert snr_db(ref, y[s]) > 60, (step, s)
        for s in range(S):  # keep every golden stream's state advancing
            if s not in (0, 1, 63, 64, 69):
                golds[s].push(blocks[s].astype(np.float64), azs[s] + step,
                              els[s])


def test_fused_kernel_non_pow2_taps(rng):
    """Non-power-of-two tap counts (taps=96 → T_pad=160, FL=129 at L=256)
    exercise every padding branch of the fused block kernel."""
    from tinaural.data import load_hrir_set

    t96 = load_hrir_set("synthetic", taps=96)
    cfg = RenderConfig(block_size=256, use_pallas=True, pallas_interpret=True)
    x = rng.standard_normal(5 * 256)
    dirs = np.stack([np.linspace(0, 300, 5), np.linspace(-20, 60, 5)], axis=1)
    y = np.asarray(BinauralRenderer(t96, cfg).render_trajectory(x, dirs))
    ref = golden.render_trajectory(t96, x, dirs, RenderConfig(block_size=256))
    assert snr_db(ref, y) > 60


@pytest.mark.parametrize("n_fft,B", [(512, 256), (1024, 256), (2048, 1024)])
def test_fused_epilogue_matches_xla(rng, n_fft, B):
    """The inverse-FFT+OLA kernel (four-step scrambled layout, Hermitian
    mirror groups, carried OLA) == the packed-XLA `_ola_ears` across all
    eligible (n1, k_ola) layouts: n1 ∈ {4, 8, 16}, k ∈ {2, 4}."""
    from tinaural.models.renderer import _fused_ola_ears, _ola_ears

    nb, F = 11, n_fft // 2 + 1
    Y = (rng.standard_normal((nb, 2, F))
         + 1j * rng.standard_normal((nb, 2, F))).astype(np.complex64)
    Y[..., 0] = Y[..., 0].real  # valid rfft spectra: real endpoint bins
    Y[..., -1] = Y[..., -1].real
    ref = np.asarray(_ola_ears(jnp.asarray(Y), n_fft, B,
                               RenderConfig(block_size=B, use_pallas=False)))
    got = np.asarray(_fused_ola_ears(
        jnp.asarray(Y), n_fft, B,
        RenderConfig(block_size=B, use_pallas=True, pallas_interpret=True)))
    assert got.shape == ref.shape
    assert snr_db(ref, got) > 100


def test_fused_epilogue_batched_source_boundaries(rng):
    """Flattened multi-source batches must not leak OLA tails across source
    boundaries (the `first`-derived shift masks) and must flush each
    source's final tail into its own appended zero blocks."""
    from tinaural.models.renderer import _fused_ola_ears, _ola_ears

    n_fft, B, S, nb = 1024, 256, 5, 7
    F = n_fft // 2 + 1
    Y = (rng.standard_normal((S, nb, 2, F))
         + 1j * rng.standard_normal((S, nb, 2, F))).astype(np.complex64)
    Y[..., 0] = Y[..., 0].real
    Y[..., -1] = Y[..., -1].real
    ref = np.asarray(_ola_ears(jnp.asarray(Y), n_fft, B,
                               RenderConfig(block_size=B, use_pallas=False)))
    got = np.asarray(_fused_ola_ears(
        jnp.asarray(Y), n_fft, B,
        RenderConfig(block_size=B, use_pallas=True, pallas_interpret=True)))
    assert got.shape == ref.shape
    assert snr_db(ref, got) > 100


def test_fused_block_step_matches_xla_spectra(table, rng):
    """The fully-fused block step (in-kernel forward FFT + assembly +
    crossfaded MAC via Y = Zf·G1 + C·G2) == the XLA spectra chain, read
    back through the scrambled-half layout, including multi-source
    `first` boundaries."""
    from tinaural.models.renderer import (_trajectory_spectra_scrambled,
                                          _trajectory_spectra_xla, next_pow2)
    from tinaural.ops.filters import DELAY_PAD
    from tinaural.ops.pallas_kernels import scramble_spectra

    cfg = RenderConfig(block_size=256, use_pallas=True, pallas_interpret=True)
    S, nb, B = 2, 5, 256
    taps = table.h.shape[-1]
    n_fft = next_pow2(B + taps + DELAY_PAD - 1)
    xbs = rng.standard_normal((S, nb, B)).astype(np.float32)
    dirs = rng.uniform(0, 360, (S, nb, 2)).astype(np.float32)
    Ysr, Ysi = _trajectory_spectra_scrambled(
        jax.device_put(table), jnp.asarray(xbs), jnp.asarray(dirs), cfg)
    Yref = jnp.stack([_trajectory_spectra_xla(
        jax.device_put(table), jnp.asarray(xbs[s]), jnp.asarray(dirs[s]),
        cfg.replace(use_pallas=False)) for s in range(S)])
    Rr, Ri = scramble_spectra(Yref, n_fft)
    assert snr_db(np.asarray(Rr), np.asarray(Ysr)) > 100
    assert snr_db(np.asarray(Ri), np.asarray(Ysi)) > 100


def test_fused_block_step_mix_matches_per_source_sum(table, rng):
    """The scene-mixdown kernel (grid (nb/chunk, S), sources iterating
    fastest, VMEM-resident output accumulation, per-source crossfade
    carries) == summing the per-source fused block step's planes."""
    from tinaural.models.renderer import (_trajectory_spectra_scrambled,
                                          _scene_spectra_fused, next_pow2)
    from tinaural.ops.filters import DELAY_PAD

    cfg = RenderConfig(block_size=256, use_pallas=True, pallas_interpret=True)
    S, nb, B = 3, 5, 256
    taps = table.h.shape[-1]
    n_fft = next_pow2(B + taps + DELAY_PAD - 1)
    xbs = rng.standard_normal((S, nb, B)).astype(np.float32)
    dirs = rng.uniform(0, 360, (S, nb, 2)).astype(np.float32)
    tb = jax.device_put(table)
    Ysr, Ysi = _scene_spectra_fused(tb, jnp.asarray(xbs), jnp.asarray(dirs),
                                    cfg, n_fft)
    Rr, Ri = _trajectory_spectra_scrambled(tb, jnp.asarray(xbs),
                                           jnp.asarray(dirs), cfg)
    assert snr_db(np.asarray(Rr.sum(0)), np.asarray(Ysr)) > 100
    assert snr_db(np.asarray(Ri.sum(0)), np.asarray(Ysi)) > 100


def test_tri_precision_parity(table, rng):
    """kernel_precision="tri" (3-pass split-bf16 matmuls) must stay well
    above the 60 dB gate end-to-end (measured ~102 dB; drops only the
    lo·lo bf16 term per matmul)."""
    cfg = RenderConfig(block_size=256, use_pallas=True, pallas_interpret=True,
                       kernel_precision="tri")
    x = rng.standard_normal(1500)
    nb = -(-1500 // 256)
    dirs = np.stack([np.linspace(0, 300, nb), np.linspace(-30, 60, nb)], axis=1)
    y = np.asarray(BinauralRenderer(table, cfg).render_trajectory(x, dirs))
    ref = golden.render_trajectory(table, x, dirs,
                                   RenderConfig(block_size=256))
    assert snr_db(ref, y) > 80


@pytest.mark.parametrize("taps", [2048, 512])
def test_fused_partitioned_matches_golden_stream(rng, taps):
    """The fused batched partitioned-conv kernel (in-kernel frames,
    forward FFT, carried delay line, crossfade pair, inverse tails) ==
    GoldenStream block by block, including the P=9 BRIR regime."""
    from tinaural.data import load_hrir_set

    tb = load_hrir_set("synthetic", taps=taps)
    B = 256
    cfg = RenderConfig(stream_block=B, use_pallas=True, pallas_interpret=True)
    r = BinauralRenderer(tb, cfg)
    N = 6 * B
    x = rng.standard_normal(N).astype(np.float32)
    nb = N // B
    dirs = np.stack([np.linspace(0, 300, nb), np.linspace(-30, 50, nb)], 1)
    y = np.asarray(r.render_streamed(x, dirs))
    gs = golden.GoldenStream(tb, RenderConfig(stream_block=B))
    ref = np.concatenate([gs.push(x[b * B:(b + 1) * B].astype(np.float64),
                                  dirs[b, 0], dirs[b, 1])
                          for b in range(nb)], -1)
    assert snr_db(ref, y) > 60


@pytest.mark.parametrize("taps,B", [(2048, 512), (512, 256)])
def test_inkernel_partitioned_assembly_parity(rng, taps, B):
    """The in-kernel assembly kernel (rfft_L + ramp + inverse-L +
    truncation + per-partition forwards from raw (h, d, g) rows;
    derivation validated at 1e-14 in
    scripts/derive_partitioned_inkernel_assembly.py) == the XLA-assembled
    fused route, and matches GoldenStream. Calls the kernel DIRECTLY so
    the comparison cannot silently collapse onto one route (the r4
    gate-fallback lesson); also asserts the production gate admits the
    BRIR shape."""
    from tinaural.data import load_hrir_set
    from tinaural.models.renderer import _partitioned_fn
    from tinaural.ops import vmem
    from tinaural.ops.interp import interpolate
    from tinaural.ops.pallas_kernels import fused_partitioned_assembled

    tb = jax.device_put(load_hrir_set("synthetic", taps=taps))
    P = -(-(taps + 64) // B)
    assert vmem.fits_partitioned_asm(taps, B, P)
    nb = 8
    xb = jnp.asarray(rng.standard_normal((nb, B)).astype(np.float32))
    dirs = jnp.asarray(np.stack(
        [np.linspace(0, 300, nb), np.linspace(-30, 50, nb)],
        axis=1).astype(np.float32))
    cfg_x = RenderConfig(stream_block=B, pallas_interpret=True,
                         part_assembly="xla")
    yx = np.asarray(_partitioned_fn(tb, xb, dirs, cfg_x))
    h, d, g = jax.vmap(lambda a, e: interpolate(tb, a, e, cfg_x))(
        dirs[:, 0], dirs[:, 1])
    first = jnp.zeros((nb,), jnp.float32).at[0].set(1.0)
    yk = np.asarray(fused_partitioned_assembled(
        xb, h, d, g, first, taps, B, P, interpret=True))
    assert snr_db(yx, yk) > 90
    gs = golden.GoldenStream(tb, RenderConfig(stream_block=B))
    x = np.asarray(xb).reshape(-1)
    ref = np.concatenate([gs.push(x[b * B:(b + 1) * B].astype(np.float64),
                                  float(dirs[b, 0]), float(dirs[b, 1]))
                          for b in range(nb)], -1)
    assert snr_db(ref, yk[:, :ref.shape[-1]]) > 60


def test_partitioned_asm_dir_rate_unique_assembly(rng):
    """Round-5: the partitioned asm kernel's dir_rate fast path —
    unique-group (h, d, g) rows assembled at chunk/k and expanded k×
    in-kernel — matches (a) the same kernel at dir_rate=1 fed the fully
    snapped track (≥100 dB: the only difference is the tri-class
    expansion matmul) and (b) golden on the snapped track (≥60 dB),
    through the PRODUCTION route (_partitioned_fn at dir_rate=4, which
    gathers only the unique rows)."""
    from tinaural.data import load_hrir_set
    from tinaural.models.renderer import _partitioned_fn
    from tinaural.ops import vmem
    from tinaural.ops.interp import interpolate
    from tinaural.ops.pallas_kernels import fused_partitioned_assembled

    taps, B, nb, k = 2048, 512, 8, 4
    tb = jax.device_put(load_hrir_set("synthetic", taps=taps))
    P = -(-(taps + 64) // B)
    assert vmem.fits_partitioned_asm(taps, B, P)
    xb = jnp.asarray(rng.standard_normal((nb, B)).astype(np.float32))
    dirs = np.stack([np.linspace(0, 300, nb), np.linspace(-30, 50, nb)],
                    axis=1).astype(np.float32)
    snapped = golden.snap_dirs(dirs, k)
    cfg1 = RenderConfig(stream_block=B, pallas_interpret=True)

    # kernel-level: unique rows + dir_rate=k == snapped rows + dir_rate=1
    jd = jnp.asarray(snapped)
    h1, d1, g1 = jax.vmap(lambda a, e: interpolate(tb, a, e, cfg1))(
        jd[:, 0], jd[:, 1])
    first = jnp.zeros((nb,), jnp.float32).at[0].set(1.0)
    y1 = np.asarray(fused_partitioned_assembled(
        xb, h1, d1, g1, first, taps, B, P, interpret=True,
        precision="tri"))
    ju = jnp.asarray(snapped[::k])
    hu, du, gu = jax.vmap(lambda a, e: interpolate(tb, a, e, cfg1))(
        ju[:, 0], ju[:, 1])
    yk = np.asarray(fused_partitioned_assembled(
        xb, hu, du, gu, first, taps, B, P, interpret=True,
        precision="tri", dir_rate=k))
    assert snr_db(y1, yk) > 100

    # production route at dir_rate=4 vs golden on the snapped track
    cfgk = RenderConfig(stream_block=B, pallas_interpret=True, dir_rate=k)
    yprod = np.asarray(_partitioned_fn(tb, xb, jnp.asarray(dirs), cfgk))
    gs = golden.GoldenStream(tb, RenderConfig(stream_block=B))
    x = np.asarray(xb).reshape(-1)
    ref = np.concatenate([gs.push(x[b * B:(b + 1) * B].astype(np.float64),
                                  float(snapped[b, 0]),
                                  float(snapped[b, 1]))
                          for b in range(nb)], -1)
    assert snr_db(ref, yprod[:, :ref.shape[-1]]) > 60
    # misaligned dir_rate inputs are rejected loudly, never mis-assembled
    with pytest.raises(ValueError, match="dir_rate"):
        fused_partitioned_assembled(xb, hu[:1], du[:1], gu[:1], first,
                                    taps, B, P, interpret=True,
                                    dir_rate=k)

    # grid-step boundary: nb=64 = 2 launch chunks at the default 32 —
    # the expanded-H crossfade carry must hand off across grid steps
    # (round-5 review finding: the BRIR-shape case above never crosses
    # one). Cheaper shape so interpret stays fast.
    taps2, B2, nb2 = 512, 256, 64
    tb2 = jax.device_put(load_hrir_set("synthetic", taps=taps2))
    P2 = -(-(taps2 + 64) // B2)
    cfg2 = RenderConfig(stream_block=B2, pallas_interpret=True)
    xb2 = jnp.asarray(rng.standard_normal((nb2, B2)).astype(np.float32))
    d2 = np.stack([np.linspace(0, 350, nb2), np.linspace(-40, 80, nb2)],
                  axis=1).astype(np.float32)
    sn2 = jnp.asarray(golden.snap_dirs(d2, k))
    h2, dd2, g2 = jax.vmap(lambda a, e: interpolate(tb2, a, e, cfg2))(
        sn2[:, 0], sn2[:, 1])
    first2 = jnp.zeros((nb2,), jnp.float32).at[0].set(1.0)
    ya = np.asarray(fused_partitioned_assembled(
        xb2, h2, dd2, g2, first2, taps2, B2, P2, interpret=True,
        precision="tri"))
    hu2, du2, gu2 = jax.tree.map(lambda z: z[::k], (h2, dd2, g2))
    yb = np.asarray(fused_partitioned_assembled(
        xb2, hu2, du2, gu2, first2, taps2, B2, P2, interpret=True,
        precision="tri", dir_rate=k))
    assert snr_db(ya, yb) > 100


def test_stream_asm_mode_brir_matches_golden(rng):
    """BRIR streaming: 2048-tap per-listener filters route through the
    fused streaming step's IN-KERNEL assembly mode (the zoom matrices it
    replaces are ~100 MB and could never ride VMEM — previously these
    shapes fell back to the XLA step). Push-for-push golden parity plus
    an explicit eligibility assertion so a gate regression can't silently
    re-route to the fallback."""
    from tinaural.data import load_hrir_set
    from tinaural.models import BatchedStream
    from tinaural.models.streaming import _use_fused_step
    from tinaural.ops.pallas_kernels import stream_step_vmem_bytes
    from tinaural.ops.vmem import KERNEL_BUDGET

    table = load_hrir_set("synthetic", taps=2048)
    B, S = 256, 3
    cfg = RenderConfig(stream_block=B, pallas_interpret=True)
    # the zoom mode must NOT fit (else this test exercises nothing new)
    assert stream_step_vmem_bytes(2048, B, S) >= KERNEL_BUDGET
    assert _use_fused_step(jax.device_put(table), cfg, S)
    bs = BatchedStream(table, S, cfg)
    golds = [golden.GoldenStream(table, RenderConfig(stream_block=B))
             for _ in range(S)]
    azs = np.array([30.0, 120.0, 250.0], np.float32)
    els = np.array([-10.0, 0.0, 40.0], np.float32)
    for step in range(3):
        blocks = rng.standard_normal((S, B)).astype(np.float32)
        y = np.asarray(bs.push(blocks, azs + 3 * step, els))
        for s in range(S):
            ref = golds[s].push(blocks[s].astype(np.float64),
                                azs[s] + 3 * step, els[s])
            assert snr_db(ref, y[s]) > 60, (step, s)


def test_fused_block_render_single_launch(table, rng):
    """The single-launch render kernel (spectra core + inverse+OLA
    composed in VMEM, scene mixdown in the plane accumulator) == golden
    for trajectory, moving scene, and static scene."""
    from tinaural.models.renderer import _use_fused_render

    cfg = RenderConfig(block_size=256, use_pallas=True, pallas_interpret=True)
    assert _use_fused_render(cfg, table.h.shape[-1], 512, 256, 1)
    r = BinauralRenderer(table, cfg)
    x = rng.standard_normal(3000)
    nb = -(-3000 // 256)
    dirs = np.stack([np.linspace(0, 300, nb), np.linspace(-30, 60, nb)], 1)
    ref = golden.render_trajectory(table, x, dirs,
                                   RenderConfig(block_size=256))
    assert snr_db(ref, np.asarray(r.render_trajectory(x, dirs))) > 80

    xs = rng.standard_normal((5, 1500))
    dmov = rng.uniform(0, 360, (5, -(-1500 // 256), 2))
    ref2 = golden.render_scene(table, xs, dmov, RenderConfig(block_size=256))
    assert snr_db(ref2, np.asarray(r.render_scene(xs, dmov))) > 80

    sd = np.stack([rng.uniform(0, 360, 5), rng.uniform(-40, 90, 5)], 1)
    ref3 = golden.render_scene(table, xs, sd, RenderConfig(block_size=256))
    assert snr_db(ref3, np.asarray(r.render_scene(xs, sd))) > 80


def test_fused_block_render_pregathered_mode(table, rng):
    """The single-launch kernel's pre-gathered (h, d, g) input mode — the
    fallback for tables too large for the in-kernel VMEM gather — must
    match the gather mode exactly."""
    from tinaural.models.renderer import next_pow2
    from tinaural.ops.filters import DELAY_PAD
    from tinaural.ops.interp import interpolate
    from tinaural.ops.pallas_kernels import fused_block_render

    cfg = RenderConfig(block_size=256, use_pallas=True, pallas_interpret=True)
    S, nb, B = 2, 6, 256
    taps = table.h.shape[-1]
    n_fft = next_pow2(B + taps + DELAY_PAD - 1)
    xbs = rng.standard_normal((S, nb, B)).astype(np.float32)
    dirs = rng.uniform(0, 360, (S * nb, 2)).astype(np.float32)
    tb = jax.device_put(table)
    h, d, g = jax.vmap(lambda a, e: interpolate(tb, a, e, cfg))(
        jnp.asarray(dirs[:, 0]), jnp.asarray(dirs[:, 1]))
    y = fused_block_render(h.reshape(S, nb, 2, taps), d.reshape(S, nb, 2),
                           g.reshape(S, nb, 2), jnp.asarray(xbs), taps,
                           n_fft, interpret=True)
    # reference: XLA spectra chain + packed epilogue, mixed over sources
    from tinaural.models.renderer import (_ola_ears,
                                          _trajectory_spectra_xla)
    cfg_x = RenderConfig(block_size=B, use_pallas=False)
    Y = sum(_trajectory_spectra_xla(tb, jnp.asarray(xbs[s]),
                                    jnp.asarray(dirs.reshape(S, nb, 2)[s]),
                                    cfg_x) for s in range(S))
    ref = _ola_ears(Y, n_fft, B, cfg_x)
    assert snr_db(np.asarray(ref), np.asarray(y)[:, :ref.shape[-1]]) > 100


def test_fused_partitioned_no_crossfade(rng):
    """crossfade=False path of the fused partitioned kernel (single MAC,
    no previous-filter row) vs the golden stream with crossfade off."""
    from tinaural.data import load_hrir_set

    tb = load_hrir_set("synthetic", taps=512)
    B = 256
    cfg = RenderConfig(stream_block=B, crossfade=False, use_pallas=True,
                       pallas_interpret=True)
    r = BinauralRenderer(tb, cfg)
    N = 5 * B
    x = rng.standard_normal(N).astype(np.float32)
    nb = N // B
    dirs = np.stack([np.linspace(0, 300, nb), np.linspace(-30, 50, nb)], 1)
    y = np.asarray(r.render_streamed(x, dirs))
    gs = golden.GoldenStream(tb, RenderConfig(stream_block=B,
                                              crossfade=False))
    ref = np.concatenate([gs.push(x[b * B:(b + 1) * B].astype(np.float64),
                                  dirs[b, 0], dirs[b, 1])
                          for b in range(nb)], -1)
    assert snr_db(ref, y) > 60


def test_filter_fft_long_taps_parity(rng):
    """taps > 192 routes the in-kernel filter rfft through the four-step
    FFT (use_filter_fft) instead of the dense MAs matmul — same linear
    map; golden-parity through the public trajectory + scene paths."""
    from tinaural.data import load_hrir_set
    from tinaural.ops.pallas_kernels import use_filter_fft

    table = load_hrir_set("synthetic", taps=256)
    assert use_filter_fft(256, 1024)
    cfg = RenderConfig(block_size=256, use_pallas=True, pallas_interpret=True)
    x = rng.standard_normal(4 * 256)
    nb = 4
    dirs = np.stack([np.linspace(10, 300, nb), np.linspace(-30, 60, nb)],
                    axis=1)
    r = BinauralRenderer(table, cfg)
    y = np.asarray(r.render_trajectory(x, dirs))
    ref = golden.render_trajectory(table, x, dirs,
                                   RenderConfig(block_size=256))
    assert snr_db(ref, y) > 60
    xs = rng.standard_normal((3, 4 * 256))
    sdirs = np.stack([rng.uniform(0, 360, 3), rng.uniform(-40, 90, 3)],
                     axis=1)
    ys = np.asarray(r.render_scene(xs, sdirs))
    refs = golden.render_scene(table, xs, sdirs,
                               RenderConfig(block_size=256))
    assert snr_db(refs, ys) > 60


def test_fused_stream_hold_matches_xla_hold(table, rng):
    """Direct hold-kernel parity: after one assembling push populates
    the FDL and carried partitions, chained `fused_stream_hold` calls ==
    the XLA `_hold_core_xla` per push. S=20 with chunks (8, 16) makes
    the grid MULTI-chunk (nch = 3 and 2) AND leaves padded tail rows
    (4 and 12) — the chunk-major packing must survive chunk boundaries,
    not just one grid step (round-5 review: the old S=5 case always
    collapsed to a single chunk)."""
    from tinaural.models.streaming import (_batch_step_core, _hold_core_xla,
                                           init_state)
    from tinaural.ops.pallas_kernels import fused_stream_hold

    B, S = 256, 20
    cfg = RenderConfig(stream_block=B)
    tbl = jax.device_put(table)
    state = jax.vmap(lambda _: init_state(tbl, cfg))(jnp.arange(S))
    azs = jnp.asarray(np.linspace(0, 300, S).astype(np.float32))
    els = jnp.asarray(np.linspace(-20, 50, S).astype(np.float32))
    xb0 = jnp.asarray(rng.standard_normal((S, B)).astype(np.float32))
    state, _ = _batch_step_core(tbl, state, xb0, azs, els, cfg)

    for chunk in (8, 16):  # 20 streams → nch 3 / 2, padding 4 / 12 rows
        st_k = state
        st_x = state
        for step in range(3):
            xb = jnp.asarray(rng.standard_normal((S, B)).astype(np.float32))
            y, fr, fi = fused_stream_hold(
                xb, st_k.prev_in, st_k.fdl_re, st_k.fdl_im,
                st_k.prev_h_re, st_k.prev_h_im, B, interpret=True,
                chunk=chunk)
            st_k = st_k._replace(prev_in=xb, fdl_re=fr, fdl_im=fi)
            st_x, y_ref = jax.vmap(
                lambda s, x: _hold_core_xla(s, x, cfg))(st_x, xb)
            assert snr_db(np.asarray(y_ref), np.asarray(y)) > 90, (chunk, step)
            assert snr_db(np.asarray(st_x.fdl_re),
                          np.asarray(fr)) > 90, (chunk, step)
