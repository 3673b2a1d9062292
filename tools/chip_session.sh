#!/bin/bash
# One-shot measurement sweep for a chip session (run when the TPU tunnel
# is healthy). Logs everything to tools/chip_session.log for analysis.
#
#   bash tools/chip_session.sh
#
# Order: cheap sanity first, then the stage/section cost maps that drive
# kernel optimization decisions, then the full matrix.
cd "$(dirname "$0")/.." || exit 1
LOG=tools/chip_session.log
{
  echo "=== chip session $(date) ==="
  echo "--- 1. bench.py (default) ---"
  timeout 900 python bench.py
  echo "--- 2. profile_stages 4:4:4 ---"
  timeout 900 python tools/profile_stages.py 4:4:4
  echo "--- 3. profile_stages 4:2:2 ---"
  timeout 900 python tools/profile_stages.py 4:2:2
  echo "--- 4. profile_stages 4:2:0 ---"
  timeout 900 python tools/profile_stages.py 4:2:0
  echo "--- 5. kernel sections 4:2:0 / 4:4:4 ---"
  timeout 900 python tools/exp_kernel_sections.py 4:2:0
  timeout 900 python tools/exp_kernel_sections.py 4:4:4
  echo "--- 6. bench_matrix ---"
  timeout 1800 python tools/bench_matrix.py
  echo "=== done $(date) ==="
} 2>&1 | tee "$LOG"
