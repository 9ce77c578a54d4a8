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
