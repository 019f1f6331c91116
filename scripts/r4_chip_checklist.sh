#!/bin/bash
# Round-4 pending on-chip validation (docs/ROADMAP.md #7) — run when the
# axon TPU tunnel is back. Each step is independently useful; later steps
# assume earlier ones passed. Do NOT land source changes while any
# official bench run is in flight (BENCH_NOTES round-4 methodology note).
# Logs land in /tmp/r4_chip/.
set -x
cd /root/repo
mkdir -p /tmp/r4_chip

# 0. tunnel sanity (fails fast if still down)
timeout 240 python -c "import jax; print(jax.devices())" || exit 1

# 1. BRIR-streaming asm-mode kernel: compile check, on-chip parity,
#    serialized per-push cost vs the XLA step (taps=2048, S=64)
timeout 1800 python scripts/profile_r4_stream_asm.py \
    2>&1 | tee /tmp/r4_chip/stream_asm.log

# 2. the nine on-chip perf gates at the round-4 floors
TINAURAL_PERF=1 timeout 3600 python -m pytest tests/test_perf_regression.py -q \
    2>&1 | tee /tmp/r4_chip/perf_gates.log

# 3. BRIR kernel chunk ladder (the named next BRIR lever — BENCH_NOTES
#    says the partitioned path may be bandwidth-bound: measure)
timeout 1800 python scripts/profile_r4_part_chunk.py \
    2>&1 | tee /tmp/r4_chip/part_chunk.log

# 4. fresh official capture (~40 min) — record in BENCH_NOTES. Pre-flight
#    `python bench.py --smoke` on CPU FIRST if any source changed since
#    the last smoke pass.
timeout 5400 python bench.py 2>&1 | tee /tmp/r4_chip/official.log
