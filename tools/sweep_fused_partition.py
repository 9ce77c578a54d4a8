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

def run(L, upd, S, interleave=False):
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
                  "supersteps_per_dispatch": S,
                  "interleave_updates": interleave},
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
# (r5 adds interleave_updates cadences: per-step updates + 1-col
# inserts in one scan — and L=256/512, legal because the 1-col insert
# escapes the ring-safety chunk bound)
# r5 measurements at the bench cadence: S=1 337.4k > S=2 288.8k >
# S=4 297.3k env-steps/s — wrapping the L=128 superstep in an outer
# S-scan ADDS ring-boundary copies around the inner act/update scans
# (the same per-outer-iteration fixed cost the interleave result
# quantified); the bench keeps S=1.
VARIANTS = [
    dict(L=16, upd=32, S=8),
    dict(L=128, upd=256, S=1),
    dict(L=128, upd=256, S=2),
    dict(L=128, upd=256, S=1, interleave=True),
    dict(L=256, upd=512, S=1, interleave=True),
    dict(L=512, upd=1024, S=1, interleave=True),
    dict(L=16, upd=32, S=8, interleave=True),
    dict(L=16, upd=32, S=8),  # A/B/A closer
]
for kw in VARIANTS:
    v = run(kw["L"], kw["upd"], kw["S"], kw.get("interleave", False))
    print(json.dumps({**kw, "env_steps_per_s": round(v, 1)}),
          flush=True)
