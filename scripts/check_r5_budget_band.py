"""Round-5 (round-4 advisor finding #2): the KERNEL_BUDGET raise from 12
to 16 MiB newly admits 12-16 MiB-ESTIMATE shapes for kernels that are
also called inside shard_map traces — where `with_xla_fallback`'s
try/except cannot catch a Mosaic compile failure. The admission rests on
the "estimators overcount Mosaic's liveness reuse ~2x" claim; this
script compiles the WORST newly-admitted shape of each kernel family
(estimate scanned to just under 16 MiB; see the table below) on the real
chip, INSIDE a 1-device shard_map, before any official capture.

Scanned band (2026-08-18, tinaural.ops.pallas_kernels estimators):
  stream zoom    taps=256 block=512 S=32      15.26 MiB
  partitioned    B=512 P=17 (taps 8640)       15.78 MiB
  block step     taps=512 n_fft=2048          15.92 MiB  (use_filter_fft set)
  block mix      taps=128 n_fft=2048 S=128    14.41 MiB
  stream hold    block=128 P=29 S=32 SC=32    15.88 MiB  (round-5 kernel)

Run alone on the chip: python scripts/check_r5_budget_band.py
Exit 0 = every shape compiled and ran under shard_map. `--interpret`
runs the same drive with interpreter-mode kernels on CPU (structure
smoke only — proves nothing about Mosaic VMEM).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tinaural_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

# `--interpret` must run on CPU even though this box's sitecustomize
# force-registers the axon TPU plugin and ignores JAX_PLATFORMS (a dead
# tunnel then HANGS backend init); the config API wins pre-init.
if "--interpret" in sys.argv or os.environ.get("JAX_PLATFORMS") == "cpu":
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass  # backend already initialized

import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P
from functools import partial

from tinaural.config import RenderConfig
from tinaural.data import load_hrir_set
from tinaural.ops import vmem

INTERP = "--interpret" in sys.argv
mesh = Mesh(np.array(jax.devices()[:1]), ("src",))
rng = np.random.default_rng(17)
failures = []


def run(name, fn, *args):
    """Compile+run fn under a 1-device shard_map (the fallback-net-blind
    context) and fence via a scalar sum."""
    try:
        specs = tuple(P() for _ in args)

        @jax.jit
        @partial(shard_map, mesh=mesh, in_specs=specs, out_specs=P(),
                 check_vma=False)
        def body(*a):
            out = fn(*a)
            return sum(jnp.sum(jnp.abs(x))
                       for x in jax.tree.leaves(out))

        v = float(np.asarray(body(*args)))
        assert np.isfinite(v), v
        print(f"{name}: OK (fenced sum {v:.3e})", flush=True)
    except Exception as e:  # noqa: BLE001 — report, don't crash the sweep
        failures.append(name)
        print(f"{name}: FAILED {str(e).splitlines()[0][:200]}", flush=True)


# ---- stream zoom: taps=256, block=512, S=32 (15.26 MiB estimate)
taps, B, S = 256, 512, 32
assert vmem.stream_mode(taps, B, S) == "zoom"
table = jax.device_put(load_hrir_set("synthetic", taps=taps))
cfg = RenderConfig(stream_block=B, pallas_interpret=INTERP)
from tinaural.models.streaming import _batch_step_core, init_state

state = jax.vmap(lambda _: init_state(table, cfg))(jnp.arange(S))
xb = jnp.asarray(rng.standard_normal((S, B)).astype(np.float32))
azs = jnp.asarray(np.linspace(0, 350, S).astype(np.float32))
els = jnp.zeros(S, jnp.float32)
run("stream_zoom taps=256 B=512 S=32",
    lambda st, x, a, e: _batch_step_core(table, st, x, a, e, cfg),
    state, xb, azs, els)

# ---- partitioned step: B=512, P=17 (15.78 MiB estimate)
from tinaural.ops.pallas_kernels import fused_partitioned_step

B2, P2, nb = 512, 17, 64
assert vmem.fits_partitioned(B2, P2)
n1p = (2 * B2) // 128
Fs2 = (n1p // 2 + 1) * 128
Hr = jnp.asarray((rng.standard_normal((nb, P2 * 2 * Fs2)) * 0.02)
                 .astype(np.float32))
Hi = jnp.asarray((rng.standard_normal((nb, P2 * 2 * Fs2)) * 0.02)
                 .astype(np.float32))
xb2 = jnp.asarray(rng.standard_normal((nb, B2)).astype(np.float32))
first = jnp.zeros((nb,), jnp.float32).at[0].set(1.0)
run("partitioned_step B=512 P=17",
    lambda x, hr, hi, f: fused_partitioned_step(
        x, hr, hi, f, B2, P2, precision="tri", interpret=INTERP),
    xb2, Hr, Hi, first)

# ---- block step: taps=512, n_fft=2048 (15.92 MiB estimate)
from tinaural.ops.pallas_kernels import fused_block_step

taps3, n_fft3, B3, nb3 = 512, 2048, 1024, 64
assert vmem.fits_block_step(taps3, n_fft3)
h3 = jnp.asarray((rng.standard_normal((nb3, 2, taps3)) * 0.05)
                 .astype(np.float32))
d3 = jnp.asarray(rng.uniform(0, 2, (nb3, 2)).astype(np.float32))
g3 = jnp.asarray(rng.uniform(0.5, 1, (nb3, 2)).astype(np.float32))
xb3 = jnp.asarray(rng.standard_normal((nb3, B3)).astype(np.float32))
first3 = jnp.zeros((nb3,), jnp.float32).at[0].set(1.0)
run("block_step taps=512 n_fft=2048",
    lambda h, d, g, x, f: fused_block_step(
        h, d, g, x, f, taps3, n_fft3, precision="tri", interpret=INTERP),
    h3, d3, g3, xb3, first3)

# ---- block mix: taps=128, n_fft=2048, S=128 (14.41 MiB estimate)
from tinaural.ops.pallas_kernels import fused_block_step_mix

taps4, n_fft4, B4, S4, nb4 = 128, 2048, 1024, 128, 8
assert vmem.fits_block_mix(taps4, n_fft4, S4)
h4 = jnp.asarray((rng.standard_normal((S4, nb4, 2, taps4)) * 0.05)
                 .astype(np.float32))
d4 = jnp.asarray(rng.uniform(0, 2, (S4, nb4, 2)).astype(np.float32))
g4 = jnp.asarray(rng.uniform(0.5, 1, (S4, nb4, 2)).astype(np.float32))
xb4 = jnp.asarray(rng.standard_normal((S4, nb4, B4)).astype(np.float32))
run("block_mix taps=128 n_fft=2048 S=128",
    lambda h, d, g, x: fused_block_step_mix(
        h, d, g, x, taps=taps4, n_fft=n_fft4, precision="tri",
        interpret=INTERP),
    h4, d4, g4, xb4)

# ---- stream hold (round-5): block=128, P=29, S=32, chunk=32
#      (15.88 MiB estimate — the no-assembly stream_update_rate step)
from tinaural.ops.pallas_kernels import (fused_stream_hold,
                                         stream_hold_vmem_bytes)

B5, P5, S5 = 128, 29, 32
SC5 = vmem.stream_hold_chunk(B5, P5, S5)
assert 12 * 2**20 < stream_hold_vmem_bytes(B5, P5, SC5) < vmem.KERNEL_BUDGET
F25 = B5 + 1
xb5 = jnp.asarray(rng.standard_normal((S5, B5)).astype(np.float32))
pv5 = jnp.asarray(rng.standard_normal((S5, B5)).astype(np.float32))
fr5 = jnp.asarray((rng.standard_normal((S5, P5, F25)) * 0.1)
                  .astype(np.float32))
fi5 = jnp.asarray((rng.standard_normal((S5, P5, F25)) * 0.1)
                  .astype(np.float32))
hr5 = jnp.asarray((rng.standard_normal((S5, P5, 2, F25)) * 0.02)
                  .astype(np.float32))
hi5 = jnp.asarray((rng.standard_normal((S5, P5, 2, F25)) * 0.02)
                  .astype(np.float32))
run(f"stream_hold B=128 P=29 S=32 SC={SC5}",
    lambda x, pv, fr, fi, hr, hi: fused_stream_hold(
        x, pv, fr, fi, hr, hi, B5, interpret=INTERP, precision="tri",
        chunk=SC5),
    xb5, pv5, fr5, fi5, hr5, hi5)

if failures:
    print(f"BUDGET-BAND CHECK FAILED: {failures}", flush=True)
    sys.exit(1)
print("BUDGET-BAND CHECK PASSED (all worst 12-16 MiB shapes compile "
      "and run under shard_map)", flush=True)
