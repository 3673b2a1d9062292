#!/bin/bash
# One-shot measurement sweep for a chip session (run when the TPU tunnel
# is healthy). Logs everything to tools/chip_session.log for analysis.
#
#   bash tools/chip_session.sh
#
# Order: cheap sanity first, then the round-2 decision measurements:
#   1. flagship bench (regression check vs 1392 Mpix/s)
#   2. transposed-chain DCT experiment (candidate verdict)
#   3. flagship bench with the candidate enabled (e2e A/B)
#   4. per-stage cost maps at 4:2:2 and 4:4:4 (the slow cells)
#   5. full ratio x algorithm matrix
cd "$(dirname "$0")/.." || exit 1
LOG=tools/chip_session.log
{
  echo "=== chip session $(date) ==="
  echo "--- 1. bench.py (baseline) ---"
  timeout 900 python bench.py
  echo "--- 2. exp_dct_chain_t ---"
  timeout 900 python tools/exp_dct_chain_t.py
  echo "--- 3. bench.py transposed ---"
  JPEG_TPU_TRANSPOSED_DCT=1 timeout 900 python bench.py
  echo "--- 4a. profile_stages 4:2:2 ---"
  timeout 900 python tools/profile_stages.py 4:2:2
  echo "--- 4b. profile_stages 4:4:4 ---"
  timeout 900 python tools/profile_stages.py 4:4:4
  echo "--- 4c. profile_stages 4:2:0 (reference point) ---"
  timeout 900 python tools/profile_stages.py 4:2:0
  echo "--- 5. bench_matrix ---"
  timeout 1800 python tools/bench_matrix.py
  echo "=== done $(date) ==="
} 2>&1 | tee "$LOG"
