"""Fused-loop chunk-partitioning sweep (round 4, the +72% finding).

Same-process A/B of the fused MinAtar superstep at IDENTICAL recipe
ratio (2 updates per env step, batch 256) and identical steps+updates
per dispatch; only the {chunk_len, updates_per_chunk, supersteps}
partitioning varies. Result (r4, STATUS.md): fewer chunk boundaries
win — L=128/u=256/S=1 = 337k env-steps/s vs 196k at the preset's
L=16/u=32/S=8; L=256 is excluded by the ring-safety constraint.
Learning at the coarse cadence validated in-band (results/r4_*_L128).

    nohup python tools/sweep_fused_partition.py > /tmp/part.log &
"""
import sys, time, json, tempfile, os
sys.path.insert(0, "/root/repo")
import numpy as np

def run(L, upd, S):
    import jax
    from rltime_tpu.parallel.fused import FusedApexTrainer
    from rltime_tpu.parallel.mesh import make_mesh
    cfg = {
        "seed": 0,
        "env": {"type": "minatar_breakout", "num_envs": 256},
        "model": {"torso": "minatar_cnn", "cnn_channels": [16],
                  "cnn_fc": 128, "head": "dueling"},
        "replay": {"steps_per_env": 512, "prioritized": True},
        "algo": {"algo": "dqn", "batch_size": 256, "n_step": 3,
                 "double_q": True, "lr": 2.5e-4,
                 "target_update_freq": 500},
        "exploration": {"type": "epsilon_greedy", "eps_start": 1.0,
                        "eps_end": 0.05, "anneal_steps": 200_000},
        "train": {"total_env_steps": 10**9, "warmup_env_steps": 0,
                  "chunk_len": L, "updates_per_chunk": upd,
                  "log_interval": 10**9,
                  "supersteps_per_dispatch": S},
    }
    t = FusedApexTrainer(cfg, tempfile.mkdtemp(),
                         mesh=make_mesh(jax.devices()[:1]))
    for _ in range(2):
        m = t.superstep()
    float(np.asarray(m["loss"]))
    s0 = t.env_steps
    t0 = time.perf_counter()
    for _ in range(6):
        m = t.superstep()
    float(np.asarray(m["loss"]))
    dt = time.perf_counter() - t0
    return (t.env_steps - s0) / dt

import jax
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# same 128 env-steps/lane and 256 updates per dispatch in each variant
for L, upd, S in ((16, 32, 8), (32, 64, 4), (64, 128, 2),
                  (128, 256, 1), (16, 32, 8)):
    v = run(L, upd, S)
    print(json.dumps({"chunk_len": L, "updates_per_chunk": upd,
                      "supersteps": S,
                      "env_steps_per_s": round(v, 1)}), flush=True)
