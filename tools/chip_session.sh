#!/bin/bash
# One-shot measurement sweep for a chip session (run when the TPU tunnel
# is healthy). Logs everything to tools/chip_session.log for analysis.
#
#   bash tools/chip_session.sh
#
# Order: cheap sanity first, then this round's decision measurements:
#   1. flagship bench (regression check: committed tree was 1394 Mpix/s;
#      the dc-merge + MXU-prefix kernel and 4:2:2 marshal fast path land
#      in this run)
#   2. segmented guarded-DCT experiment (timing + per-segment stats +
#      bit-equality; decides whether guarded becomes the RealDCT default)
#   3. flagship bench with guarded DCT (e2e A/B)
#   4. per-stage cost maps at 4:4:4 / 4:2:2 / 4:2:0, default and guarded
#   5. full ratio x algorithm matrix
cd "$(dirname "$0")/.." || exit 1
LOG=tools/chip_session.log
{
  echo "=== chip session $(date) ==="
  echo "--- 1. bench.py (default) ---"
  timeout 900 python bench.py
  echo "--- 2. exp_dct_guarded (segmented) ---"
  timeout 1200 python tools/exp_dct_guarded.py
  echo "--- 3. bench.py guarded ---"
  JPEG_TPU_GUARDED_DCT=1 timeout 900 python bench.py
  echo "--- 3b. bench.py oct-merge ---"
  JPEG_TPU_KERNEL_MERGE=4 timeout 900 python bench.py
  echo "--- 3c. bench.py guarded + oct-merge ---"
  JPEG_TPU_GUARDED_DCT=1 JPEG_TPU_KERNEL_MERGE=4 timeout 900 python bench.py
  echo "--- 4a. profile_stages 4:4:4 ---"
  timeout 900 python tools/profile_stages.py 4:4:4
  echo "--- 4b. profile_stages 4:4:4 guarded ---"
  JPEG_TPU_GUARDED_DCT=1 timeout 900 python tools/profile_stages.py 4:4:4
  echo "--- 4c. profile_stages 4:2:2 ---"
  timeout 900 python tools/profile_stages.py 4:2:2
  echo "--- 4d. profile_stages 4:2:0 ---"
  timeout 900 python tools/profile_stages.py 4:2:0
  echo "--- 5. bench_matrix ---"
  timeout 1800 python tools/bench_matrix.py
  echo "=== done $(date) ==="
} 2>&1 | tee "$LOG"
