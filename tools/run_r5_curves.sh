#!/bin/bash
# Round-5 on-chip campaign (STRICTLY sequential — one TPU process at a
# time, CLAUDE.md). Part A: scored runs at intermediate chunk
# partitionings for the two cadence-sensitive configs (VERDICT r4
# Next #2 — is there a learning-safe cadence faster than L=16?).
# Part B: IQN/R2D2 learner throughput legs. Part C: profile
# attribution at the new S=64 bench shape. Part D: final bench.
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
cd /root/repo

run_scored () {  # name preset extra_overrides...
  local name=$1 preset=$2; shift 2
  echo "=== $name $(date) ==="
  python -m rltime_tpu.train "$preset" --result-dir "results/$name" \
    "$@" > "/tmp/r5_${name}.log" 2>&1
  python -m rltime_tpu.eval "results/$name" --episodes 30 --best \
    > "/tmp/r5_${name}_eval.json" 2>>"/tmp/r5_${name}.log"
  cat "/tmp/r5_${name}_eval.json"
}

# --- Part A: scored cadence runs ---
run_scored asterix_L32 minatar_asterix_dqn \
  --train.chunk_len=32 --train.updates_per_chunk=64 \
  --train.supersteps_per_dispatch=4
run_scored asterix_L64 minatar_asterix_dqn \
  --train.chunk_len=64 --train.updates_per_chunk=128 \
  --train.supersteps_per_dispatch=2
run_scored biqn_L32 minatar_breakout_iqn \
  --train.total_env_steps=5000000 \
  --train.chunk_len=32 --train.updates_per_chunk=64 \
  --train.supersteps_per_dispatch=4
run_scored biqn_L64 minatar_breakout_iqn \
  --train.total_env_steps=5000000 \
  --train.chunk_len=64 --train.updates_per_chunk=128 \
  --train.supersteps_per_dispatch=2

# --- Part B: IQN / R2D2 learner legs ---
echo "=== algo legs $(date) ==="
python tools/bench_algo_legs.py > /tmp/r5_algo_legs.log 2>&1
grep RESULT /tmp/r5_algo_legs.log

# --- Part C: profile attribution at S=64 ---
echo "=== profile $(date) ==="
timeout 550 python tools/profile_bench.py > /tmp/r5_profile_base.log 2>&1
tail -20 /tmp/r5_profile_base.log

# --- Part D: final bench ---
echo "=== bench $(date) ==="
python bench.py > /tmp/r5_bench_final.json 2>/tmp/r5_bench_final.log
cat /tmp/r5_bench_final.json
echo "=== DONE_ALL $(date) ==="
