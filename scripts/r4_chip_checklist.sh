#!/bin/bash
# Round-4 pending on-chip validation (docs/ROADMAP.md #7) — run when the
# axon TPU tunnel is back. Each step is independently useful; later steps
# assume earlier ones passed. Do NOT land source changes while any
# official bench run is in flight (BENCH_NOTES round-4 methodology note).
set -x
cd /root/repo

# 0. tunnel sanity (fails fast if still down)
timeout 240 python -c "import jax; print(jax.devices())" || exit 1

# 1. BRIR-streaming asm-mode kernel: compile check, on-chip parity,
#    serialized per-push cost vs the XLA step (taps=2048, S=64)
timeout 1800 python scripts/profile_r4_stream_asm.py

# 2. the nine on-chip perf gates at the round-4 floors
TINAURAL_PERF=1 timeout 3600 python -m pytest tests/test_perf_regression.py -q

# 3. optional: fresh official capture (~40 min) — record in BENCH_NOTES
# timeout 5400 python bench.py
