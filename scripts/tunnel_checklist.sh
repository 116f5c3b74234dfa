#!/bin/bash
# TPU-validation queue for when the axon tunnel returns (it went down
# mid-round-2; CLAUDE.md "Round-2 late-session additions"). Run top to
# bottom; each step is independently re-runnable. Expect the FIRST run of
# each program to pay a cold compile (minutes) — .jax_cache/ makes
# re-runs fast.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "== 1. backend alive + bench (train step; validates everything since 92875b1)"
timeout 3600 python bench.py || exit 1

echo "== 2. inference + NMS bench"
BENCH_MODE=infer timeout 1800 python bench.py

echo "== 3. remat HBM accounting (AOT, no execution)"
timeout 3600 python scripts/remat_hbm.py

echo "== 4. real-photo quality loop incl. remat + 1-device eval (tiny, ~6 min)"
QLR_STEPS=400 QLR_REMAT=1 timeout 3600 python scripts/tpu_quality_real.py

echo "== 5. serving throughput"
timeout 1800 python scripts/bench_serve.py || true

echo "tunnel checklist complete — record numbers in BASELINE.md / CLAUDE.md"
