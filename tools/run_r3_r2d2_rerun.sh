#!/bin/bash
# Re-train minatar_breakout_r2d2 on-chip with the fixed update rate
# (updates_per_chunk 4->8, lr 2e-4 — the round-3 CartPole R2D2 fix),
# after the perf script releases the chip (one TPU process at a time).
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
cd /root/repo
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
echo "=== r2d2_rerun $(date) ==="
python -m rltime_tpu.train minatar_breakout_r2d2 \
  --result-dir results/r3_minatar_r2d2_v2 > /tmp/r3_r2d2_v2.log 2>&1
python -m rltime_tpu.eval results/r3_minatar_r2d2_v2 --episodes 30 \
  --best > /tmp/r3_r2d2_v2_eval.json 2>> /tmp/r3_r2d2_v2.log
cat /tmp/r3_r2d2_v2_eval.json
echo "=== DONE_R2D2_V2 $(date) ==="
