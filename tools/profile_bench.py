"""Trace bench.py's EXACT fused superstep program and print top HLO ops.

bench.py measures S x (1 chunk insert + 4 updates) as one XLA program;
tools/profile_update.py profiles the older multi-update-only program.
This tool profiles the bench program itself so optimization work
targets what the driver actually measures.

Usage:  timeout 550 python tools/profile_bench.py
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from rltime_tpu.history.replay import (
        ReplayConfig, replay_init, replay_insert)
    from rltime_tpu.models.policy import ModelConfig
    from rltime_tpu.training.learner import (
        AlgoConfig, make_train_state, make_update_step,
        make_insert_and_update_step)

    E, T, L, F, n_step = 64, 1024, 32, 4, 3
    batch = 256
    rcfg = ReplayConfig(num_envs=E, steps_per_env=T, horizon=n_step,
                        chunk_len=L, lookback=F - 1, prioritized=True)
    mcfg = ModelConfig(num_actions=6, torso="nature_cnn",
                       head="dueling", compute_dtype="bfloat16")
    acfg = AlgoConfig(algo="dqn", batch_size=batch, n_step=n_step,
                      double_q=True, lr=1e-4, target_update_freq=500)
    fields = {"obs": ((84, 84), jnp.uint8),
              "action": ((), jnp.int32),
              "reward": ((), jnp.float32),
              "terminated": ((), jnp.bool_),
              "done": ((), jnp.bool_)}
    rstate = replay_init(rcfg, fields)
    rng = np.random.default_rng(0)
    S = 16

    def chunk(k):
        return dict(
            obs=rng.integers(0, 255, size=(E, L, 84, 84), dtype=np.uint8),
            action=rng.integers(0, 6, size=(E, L)).astype(np.int32),
            reward=rng.normal(size=(E, L)).astype(np.float32),
            terminated=(rng.random((E, L)) < 0.02),
            done=(rng.random((E, L)) < 0.02))

    for k in range(8):
        rstate = replay_insert(rcfg, rstate, chunk(k))

    ex_obs = jnp.zeros((1, F, 84, 84), jnp.uint8)
    tstate = make_train_state(mcfg, acfg, jax.random.key(0), ex_obs)
    update = make_update_step(mcfg, acfg, rcfg, F, False)
    insert_update = make_insert_and_update_step(rcfg, update, 4)

    def superstep(tstate, rstate, beta, chunks):
        def body(carry, ck):
            ts, rs = carry
            ts, rs, m = insert_update(ts, rs, ck, beta)
            return (ts, rs), m
        (tstate, rstate), ms = jax.lax.scan(body, (tstate, rstate),
                                            chunks)
        return tstate, rstate, jax.tree.map(lambda x: x[-1], ms)

    superstep = jax.jit(superstep, donate_argnums=(0, 1))

    def stacked(base):
        out = [chunk(base + i) for i in range(S)]
        return {k: jnp.asarray(np.stack([c[k] for c in out]))
                for k in out[0]}

    beta = jnp.float32(0.4)
    for i in range(1):
        tstate, rstate, m = superstep(tstate, rstate, beta,
                                      stacked(20 + S * i))
    float(np.asarray(m["loss"]))

    tdir = "/tmp/profile_bench"
    os.system(f"rm -rf {tdir}")
    dev_chunks = [stacked(100 + S * i) for i in range(2)]
    float(np.asarray(dev_chunks[-1]["reward"][0, 0, 0]))
    with jax.profiler.trace(tdir):
        for i in range(2):
            tstate, rstate, m = superstep(tstate, rstate, beta,
                                          dev_chunks[i])
        float(np.asarray(m["loss"]))

    paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace written")
        return
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
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
    print(f"device-event total {total/1e3:.2f} ms over 2 dispatches "
          f"x {S}x(insert+4 upd) "
          f"({total/(2*S*4)/1e3:.3f} ms/update if exclusive)")
    for name, us in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{us/1e3:9.3f} ms  x{cnt[name]:<5d} {name[:100]}")


if __name__ == "__main__":
    main()
