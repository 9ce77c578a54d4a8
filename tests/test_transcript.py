"""Exact-numerics transcript (SURVEY.md §7 hard part 4): fixed seed
=> identical transcripts; seed change => divergence."""
import jax
import numpy as np

from rltime_tpu.training.trainer import Trainer


def _cfg(seed=0):
    return {
        "seed": seed,
        "env": {"type": "counting_env", "num_envs": 4, "episode_len": 7},
        "frame_stack": 1,
        "model": {"torso": "mlp", "mlp_hidden": [16], "head": "linear"},
        "replay": {"steps_per_env": 128, "prioritized": True},
        "algo": {"algo": "dqn", "batch_size": 8, "n_step": 2,
                 "lr": 1e-3, "target_update_freq": 10},
        "exploration": {"type": "epsilon_greedy", "eps_start": 0.5,
                        "eps_end": 0.1, "anneal_steps": 300},
        "train": {"total_env_steps": 400, "warmup_env_steps": 100,
                  "chunk_len": 8, "updates_per_chunk": 1,
                  "log_interval": 10_000, "checkpoint_interval": 10_000,
                  "record_transcript": True},
    }


def test_transcript_deterministic_and_seed_sensitive(tmp_path):
    t1 = Trainer(_cfg(0), str(tmp_path / "a")).train()
    t2 = Trainer(_cfg(0), str(tmp_path / "b")).train()
    t3 = Trainer(_cfg(1), str(tmp_path / "c")).train()
    assert t1.transcript.digest() == t2.transcript.digest()
    assert t1.transcript.digest() != t3.transcript.digest()
    # records carry real content
    recs = t1.transcript.records
    assert any("leaves" in r for r in recs)
    assert (tmp_path / "a" / "transcript.jsonl").exists()


def test_transcript_load_roundtrip(tmp_path):
    from rltime_tpu.utils.transcript import Transcript
    t1 = Trainer(_cfg(0), str(tmp_path / "a")).train()
    loaded = Transcript.load(str(tmp_path / "a" / "transcript.jsonl"))
    assert loaded.digest() == t1.transcript.digest()


def test_fused_transcript_matches_trainer(tmp_path):
    """The [BJ] exactness harness covers the FLAGSHIP path (VERDICT r4
    Next #4): fused superstep transcripts at d=1 are byte-identical to
    the 2-dispatch Trainer+DeviceActor transcripts — same actions
    digests, same sampled leaves, same TD digests, chunk for chunk.

    Same folded-learner-key emulation as
    test_parallel.py::test_fused_matches_trainer_path (the sharded
    learner folds the shard index into its sampling key)."""
    import jax
    from rltime_tpu.parallel.fused import FusedApexTrainer
    from rltime_tpu.parallel.mesh import make_mesh
    from rltime_tpu.training.learner import (
        make_insert_and_update_step, make_update_step)

    cfg = {
        "seed": 5,
        "env": {"type": "cartpole_device", "num_envs": 4},
        "model": {"torso": "mlp", "mlp_hidden": [16],
                  "head": "linear"},
        "replay": {"steps_per_env": 128, "prioritized": True},
        "algo": {"algo": "dqn", "batch_size": 8, "n_step": 2,
                 "lr": 1e-3, "target_update_freq": 10},
        "exploration": {"type": "epsilon_greedy", "eps_start": 1.0,
                        "eps_end": 0.1, "anneal_steps": 2000},
        "train": {"total_env_steps": 1280, "warmup_env_steps": 0,
                  "chunk_len": 16, "updates_per_chunk": 2,
                  "log_interval": 10**9, "checkpoint_interval": 10**9,
                  "record_transcript": True},
    }
    tr = Trainer(cfg, str(tmp_path / "trainer"))
    upd = make_update_step(tr.model_cfg, tr.algo_cfg, tr.replay_cfg,
                           1, tr.flatten)

    def folded(ts, rs, beta):
        lt = ts.replace(key=jax.random.fold_in(ts.key, 0))
        nt, nr, m = upd(lt, rs, beta)
        return nt.replace(key=jax.random.split(ts.key, 3)[0]), nr, m

    tr._insert_update = jax.jit(
        make_insert_and_update_step(tr.replay_cfg, folded, 2),
        donate_argnums=(0, 1))
    fu = FusedApexTrainer(cfg, str(tmp_path / "fused"),
                          mesh=make_mesh(jax.devices()[:1]))
    for _ in range(5):
        tr.train_chunk()
        fu.superstep()
    assert len(tr.transcript.records) == len(fu.transcript.records) \
        == 5
    assert tr.transcript.digest() == fu.transcript.digest()
    assert all("leaves" in r for r in fu.transcript.records)
