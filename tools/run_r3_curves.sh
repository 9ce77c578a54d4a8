#!/bin/bash
# Round-3 on-chip validation: bench + learning curves for the three
# MinAtar algorithm configs (DQN fused flagship, IQN, R2D2), run
# STRICTLY sequentially (one TPU process at a time — CLAUDE.md).
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
cd /root/repo
echo "=== bench $(date) ==="
python bench.py > /tmp/r3_bench1.json 2> /tmp/r3_bench1.log
cat /tmp/r3_bench1.json
echo "=== dqn $(date) ==="
python -m rltime_tpu.train minatar_breakout_dqn --result-dir results/r3_minatar_dqn > /tmp/r3_dqn.log 2>&1
python -m rltime_tpu.eval results/r3_minatar_dqn --episodes 30 > /tmp/r3_dqn_eval.json 2>>/tmp/r3_dqn.log
echo "=== iqn $(date) ==="
python -m rltime_tpu.train minatar_breakout_iqn --result-dir results/r3_minatar_iqn > /tmp/r3_iqn.log 2>&1
python -m rltime_tpu.eval results/r3_minatar_iqn --episodes 30 > /tmp/r3_iqn_eval.json 2>>/tmp/r3_iqn.log
echo "=== r2d2 $(date) ==="
python -m rltime_tpu.train minatar_breakout_r2d2 --result-dir results/r3_minatar_r2d2 > /tmp/r3_r2d2.log 2>&1
python -m rltime_tpu.eval results/r3_minatar_r2d2 --episodes 30 > /tmp/r3_r2d2_eval.json 2>>/tmp/r3_r2d2.log
echo "=== DONE_ALL $(date) ==="
