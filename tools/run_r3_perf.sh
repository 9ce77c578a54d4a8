#!/bin/bash
# Round-3 perf follow-up, STRICTLY after tools/run_r3_curves.sh
# finishes (one TPU process at a time — CLAUDE.md). Waits on the
# curve driver PID if given, then runs (sequentially):
#   1. tools/bench_pallas_gather.py — Pallas fused union gather A/B
#   2. tools/profile_bench.py      — HLO op breakdown of the bench
#   3. tools/sweep_superstep.py    — S sweep for the learner bench
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
cd /root/repo
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
echo "=== pallas_ab $(date) ==="
timeout 1800 python tools/bench_pallas_gather.py > /tmp/r3_pallas_ab.log 2>&1
tail -5 /tmp/r3_pallas_ab.log
echo "=== profile $(date) ==="
timeout 1800 python tools/profile_bench.py > /tmp/r3_profile.log 2>&1
tail -20 /tmp/r3_profile.log
echo "=== sweep $(date) ==="
timeout 2400 python tools/sweep_superstep.py 8 16 32 > /tmp/r3_sweep.log 2>&1
tail -6 /tmp/r3_sweep.log
echo "=== fused_sweep $(date) ==="
timeout 2400 python tools/sweep_fused_minatar.py 2 4 8 16 > /tmp/r3_fused_sweep.log 2>&1
tail -7 /tmp/r3_fused_sweep.log
echo "=== DONE_PERF $(date) ==="
