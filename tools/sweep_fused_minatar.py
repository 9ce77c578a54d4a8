"""A/B sweep of supersteps_per_dispatch for the fused MinAtar
acting+learning loop (the bench.py `minatar_env_steps_per_s` program),
all in ONE process (CLAUDE.md A/B rule).

Usage: timeout 2400 python tools/sweep_fused_minatar.py [S ...]
"""
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from rltime_tpu.parallel.fused import FusedApexTrainer
    from rltime_tpu.parallel.mesh import make_mesh

    sweep = [int(a) for a in sys.argv[1:]] or [4, 8]
    # each non-cached S costs a ~25-min remote compile on this
    # sandbox; keep the sweep to the cached S=4 plus one challenger
    # unless SWEEP_ALL is set
    if not os.environ.get("SWEEP_ALL"):
        sweep = [s for s in sweep if s in (4, 8)] or [4, 8]
    results = {}
    for s in sweep:
        cfg = {
            "seed": 0,
            "env": {"type": "minatar_breakout", "num_envs": 256},
            "model": {"torso": "minatar_cnn", "cnn_channels": [16],
                      "cnn_fc": 128, "head": "dueling"},
            "replay": {"steps_per_env": 512, "prioritized": True},
            "algo": {"algo": "dqn", "batch_size": 256, "n_step": 3,
                     "double_q": True, "lr": 2.5e-4,
                     "target_update_freq": 500},
            "exploration": {"type": "epsilon_greedy",
                            "eps_start": 1.0, "eps_end": 0.05,
                            "anneal_steps": 200_000},
            "train": {"total_env_steps": 10**9,
                      "warmup_env_steps": 0, "chunk_len": 16,
                      "updates_per_chunk": 32,
                      "log_interval": 10**9,
                      "supersteps_per_dispatch": s},
        }
        t = FusedApexTrainer(cfg, tempfile.mkdtemp(),
                             mesh=make_mesh(jax.devices()[:1]))
        t0 = time.perf_counter()
        for _ in range(2):
            m = t.superstep()
        float(np.asarray(m["loss"]))
        compile_s = time.perf_counter() - t0
        dispatches = max(2, 24 // s)
        s0 = t.env_steps
        t0 = time.perf_counter()
        for _ in range(dispatches):
            m = t.superstep()
        float(np.asarray(m["loss"]))
        dt = time.perf_counter() - t0
        rate = (t.env_steps - s0) / dt
        results[s] = rate
        print(f"S={s:3d}: {rate:12,.1f} env-steps/s "
              f"({dispatches} dispatches, {dt*1e3/dispatches:.1f} "
              f"ms/dispatch, first-call {compile_s:.1f}s)")

    best = max(results, key=results.get)
    print(f"best: S={best} at {results[best]:,.1f} env-steps/s")


if __name__ == "__main__":
    main()
