"""Worker process for the true multi-process FUSED-flagship test
(tests/test_multiprocess.py). Runs as one of N jax.distributed
processes (gloo CPU collectives) driving the one-dispatch SPMD
superstep over a PROCESS-SPANNING mesh — the pod-scale north-star
path (SURVEY.md §0 item 6) exercised without a pod: callback-built
global actor/replay state, shard_map acting+insert+update with grad
pmean crossing the process boundary, per-process sidecar checkpoints,
deterministic resume.

Usage: python _mp_fused_worker.py <process_id> <num_processes> <port> \
           <devices_per_proc> <out_json> <result_dir>
"""
import json
import os
import sys


def fused_cfg(resume=False):
    return {
        "seed": 0,
        "env": {"type": "cartpole_device", "num_envs": 2},
        "model": {"torso": "mlp", "mlp_hidden": [16],
                  "head": "linear"},
        "replay": {"steps_per_env": 128, "prioritized": True,
                   "use_inserted_priorities": True},
        "algo": {"algo": "dqn", "batch_size": 4, "n_step": 2,
                 "lr": 1e-3, "target_update_freq": 10},
        "exploration": {"type": "epsilon_greedy", "eps_start": 1.0,
                        "eps_end": 0.1, "anneal_steps": 2000},
        "train": {"total_env_steps": 2048, "warmup_env_steps": 128,
                  "chunk_len": 8, "updates_per_chunk": 2,
                  # log interval small enough to exercise the GLOBAL
                  # best-checkpoint path (pooled stats + collective
                  # save) several times during the run
                  "log_interval": 512, "track_best": True,
                  "best_min_episodes": 1,
                  "checkpoint_interval": 10**9,
                  "checkpoint_replay": True, "trainer": "fused",
                  "supersteps_per_dispatch": 2, "resume": resume},
    }


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    n_dev = int(sys.argv[4])
    out_path = sys.argv[5]
    result_dir = sys.argv[6]

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_dev}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

    import numpy as np
    from jax.experimental import multihost_utils
    from rltime_tpu.parallel.fused import FusedApexTrainer

    t = FusedApexTrainer(fused_cfg(), result_dir).train()
    multihost_utils.sync_global_devices("fused_checkpoint_written")

    def checksum_of(state):
        leaves = jax.tree.leaves(jax.device_get(state.params))
        return float(sum(np.abs(np.asarray(l)).sum() for l in leaves))

    checksum = checksum_of(t.train_state)
    # train() pops episode stats at every log interval now (the global
    # best-checkpoint path), so count completions cumulatively:
    # _stats_popped holds each shard's lifetime completed-episode
    # cursor, plus whatever is still fresh in the rings.
    t.episode_stats()   # syncs _stats_popped to the lifetime cursors
    num_episodes = sum(t._stats_popped.values())

    # Deterministic resume: two fresh trainers restoring the same
    # checkpoint (lead learner + THIS process's sidecar: actor rows,
    # replay shards) must evolve identically through more supersteps.
    resumed = []
    for _ in range(2):
        r = FusedApexTrainer(fused_cfg(resume=True), result_dir)
        assert r.env_steps == t.env_steps, (r.env_steps, t.env_steps)
        for _ in range(3):
            r.superstep()
        resumed.append(checksum_of(r.train_state))
        multihost_utils.sync_global_devices("fused_resume_leg_done")

    best_path = os.path.join(result_dir, "checkpoints", "best.json")
    best = (json.load(open(best_path))
            if os.path.exists(best_path) else None)
    with open(out_path, "w") as f:
        json.dump({
            "process_id": pid,
            "global_devices": len(jax.devices()),
            "local_devices": jax.local_device_count(),
            "updates_done": t.updates_done,
            "env_steps": t.env_steps,
            "param_checksum": checksum,
            "num_episodes": num_episodes,
            "resumed_checksum_a": resumed[0],
            "resumed_checksum_b": resumed[1],
            "best": best,
        }, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
