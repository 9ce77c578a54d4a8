"""Trace the fused K=4 learner update on-chip and print top HLO ops.

Runs bench.py's exact update config under jax.profiler.trace, then
parses the chrome-trace JSON the profiler writes and aggregates device
op durations — the data behind the optimization notes in
ops/dense_tree.py and bench.py. One-off measurement tool.

Usage:  timeout 500 python tools/profile_update.py [sampler]
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    sampler = sys.argv[1] if len(sys.argv) > 1 else "dense"
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from rltime_tpu.history.replay import (
        ReplayConfig, replay_init, replay_insert)
    from rltime_tpu.models.policy import ModelConfig
    from rltime_tpu.training.learner import (
        AlgoConfig, make_train_state, make_update_step,
        make_multi_update_step)

    E, T, L, F, n = 64, 1024, 32, 4, 3
    fields = {"obs": ((84, 84), jnp.uint8),
              "action": ((), jnp.int32),
              "reward": ((), jnp.float32),
              "terminated": ((), jnp.bool_),
              "done": ((), jnp.bool_)}
    rng = np.random.default_rng(0)
    ck = dict(obs=rng.integers(0, 255, size=(E, L, 84, 84),
                               dtype=np.uint8),
              action=rng.integers(0, 6, size=(E, L)).astype(np.int32),
              reward=rng.normal(size=(E, L)).astype(np.float32),
              terminated=(rng.random((E, L)) < 0.02),
              done=(rng.random((E, L)) < 0.02))
    rcfg = ReplayConfig(num_envs=E, steps_per_env=T, horizon=n,
                        chunk_len=L, lookback=F - 1, prioritized=True,
                        sampler=sampler)
    rstate = replay_init(rcfg, fields)
    for k in range(8):
        rstate = replay_insert(rcfg, rstate, ck)
    mcfg = ModelConfig(num_actions=6, torso="nature_cnn",
                       head="dueling", compute_dtype="bfloat16")
    acfg = AlgoConfig(algo="dqn", batch_size=256, n_step=n,
                      double_q=True, lr=1e-4, target_update_freq=500)
    ts = make_train_state(mcfg, acfg, jax.random.key(0),
                          jnp.zeros((1, F, 84, 84), jnp.uint8))
    upd = jax.jit(make_multi_update_step(
        make_update_step(mcfg, acfg, rcfg, F, False), 4),
        donate_argnums=(0, 1))
    beta = jnp.float32(0.4)
    for _ in range(3):
        ts, rstate, m = upd(ts, rstate, beta)
    float(np.asarray(m["loss"]))

    tdir = "/tmp/profile_update"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(4):
            ts, rstate, m = upd(ts, rstate, beta)
        float(np.asarray(m["loss"]))

    paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace written; files:",
              glob.glob(f"{tdir}/**/*", recursive=True))
        return
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device-track complete events: aggregate wall us by op name.
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    dev_pids = {p for p, nm in pid_names.items()
                if "TPU" in nm or "/device" in nm.lower()}
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))
        agg[name] += dur
        cnt[name] += 1
        total += dur
    print(f"sampler={sampler}; device-event total {total/1e3:.2f} ms "
          f"over 4 dispatches x 4 updates "
          f"({total/16/1e3:.3f} ms/update if exclusive)")
    for name, us in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{us/1e3:9.3f} ms  x{cnt[name]:<5d} {name[:100]}")


if __name__ == "__main__":
    main()
