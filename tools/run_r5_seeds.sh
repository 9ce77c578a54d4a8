#!/bin/bash
# Round-5 seed-robustness runs: the learning-curve record was
# single-seed; replicate the three directly-validated L=32-cadence
# configs at a second seed (strictly sequential — one TPU process).
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
cd /root/repo

run_scored () {
  local name=$1 preset=$2; shift 2
  echo "=== $name $(date) ==="
  python -m rltime_tpu.train "$preset" --result-dir "results/$name" \
    "$@" > "/tmp/r5_${name}.log" 2>&1
  python -m rltime_tpu.eval "results/$name" --episodes 30 --best \
    > "/tmp/r5_${name}_eval.json" 2>>"/tmp/r5_${name}.log"
  cat "/tmp/r5_${name}_eval.json"
}

run_scored breakout_s1 minatar_breakout_dqn --seed=1
run_scored asterix_s1 minatar_asterix_dqn --seed=1
run_scored biqn_s1 minatar_breakout_iqn --seed=1 \
  --train.total_env_steps=5000000
echo "=== DONE_SEEDS $(date) ==="
