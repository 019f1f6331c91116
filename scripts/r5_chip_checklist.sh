#!/bin/bash
# Round-5 chip session (round-4 VERDICT "Next round" #1/#2/#4/#5 + the
# advisor's budget-band check). Run when the axon TPU tunnel is back.
# Each step is independently useful; later steps assume earlier ones
# passed. Do NOT land source changes while any step is in flight
# (BENCH_NOTES round-4 methodology note). Logs land in /tmp/r5_chip/.
#
# ORDERING (changed late round 5): the tunnel has now been down for the
# bulk of two sessions, and round 4 lost its entire official record to
# an outage. The OFFICIAL CAPTURE is therefore step 1 — the moment the
# tunnel answers, the round's number of record is taken at the already
# smoke-certified HEAD, before anything else can burn tunnel-up time or
# die mid-probe. Validation probes and the perf gates follow; any
# source change they motivate (chunk adoption, gate ratchet) happens
# AFTER, followed by `bench.py --smoke` re-certification and, if time
# allows, a second official run.
#
# Round-4 claims are validated at r5 HEAD rather than the r4 commit.
# NOTE (updated mid-round): the r5 kernel diff is NOT empty anymore —
#   git diff bcf2823..HEAD -- tinaural/ops/pallas_kernels.py
# now carries (a) the partitioned kernel's dir_rate unique-filter
# assembly (e08908f; touches the timed w_brir dir4 extra only — the
# dir1 path is untouched) and (b) the round-5 fused_stream_hold kernel
# + an `if nh_out is not None` guard in _stream_conv_core (cec8bbc;
# touches only stream_update_rate>1 paths, which no r4 claim covers).
# The r4-claims-at-HEAD equivalence therefore holds for every workload
# EXCEPT brir dir4; step 2's perf gates revalidate everything anyway.
set -x
cd /root/repo
mkdir -p /tmp/r5_chip

# 0. tunnel sanity (fails fast if still down)
timeout 240 python -c "import jax; print(jax.devices())" || exit 1

# 1. OFFICIAL CAPTURE FIRST (~40 min) — the round's number of record
#    (VERDICT #1). HEAD must already be `bench.py --smoke`-certified
#    (it is: BENCH_NOTES round-5 session-state note); do NOT land
#    source between the smoke pass and this run. Route proofs + the
#    scene_choir A/B ride along; record in BENCH_NOTES.
timeout 7200 python bench.py 2>&1 | tee /tmp/r5_chip/official.log

# 2. the nine on-chip perf gates at the round-4 floors (ratchet to the
#    r5 officials AFTER the capture lands — VERDICT #7)
TINAURAL_PERF=1 timeout 3600 python -m pytest tests/test_perf_regression.py -q \
    2>&1 | tee /tmp/r5_chip/perf_gates.log

# 3. BRIR-streaming asm-mode kernel (VERDICT #2 / ROADMAP #7): compile
#    check, on-chip parity, serialized per-push cost vs the XLA step
timeout 1800 python scripts/profile_r4_stream_asm.py \
    2>&1 | tee /tmp/r5_chip/stream_asm.log

# 3b. stream_update_rate A/B (round-5 streams lever): push_many at
#     k=1/2/4 on 2048-tap asm-mode streams — on-chip parity vs the
#     snapped-track equivalence + per-push cost; adopt a bench extra
#     if the hold-step floor is materially under the k=1 cost
timeout 1800 python scripts/profile_r5_update_rate.py \
    2>&1 | tee /tmp/r5_chip/update_rate.log

# 4. budget-band compile check (advisor #2): worst 12-16 MiB-estimate
#    shapes of every kernel family, compiled INSIDE shard_map
timeout 1800 python scripts/check_r5_budget_band.py \
    2>&1 | tee /tmp/r5_chip/budget_band.log

# 5. BRIR chunk ladder (VERDICT #4): both partitioned kernels, incl.
#    over-budget probes that would recalibrate ASM_BUDGET
timeout 2400 python scripts/profile_r5_part_chunk.py \
    2>&1 | tee /tmp/r5_chip/part_chunk.log

# 6. (manual) adopt any measured wins from 3/3b/4/5, ratchet the perf
#    gate floors to ~25% under the step-1 medians, re-run
#    `python bench.py --smoke` on CPU, then take a second official
#    capture if the tunnel is still up.
