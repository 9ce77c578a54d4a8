"""Atari engine tests — gated on ale_py (SURVEY.md §4 item 3: tiny
Pong smoke test behind a marker; runs automatically once ale-py is
installed)."""
import numpy as np
import pytest

try:
    import ale_py  # noqa: F401
    HAS_ALE = True
except ImportError:
    HAS_ALE = False

pytestmark = pytest.mark.skipif(not HAS_ALE, reason="ale_py not installed")


def test_atari_vec_env_basic():
    from rltime_tpu.envs.atari import AtariVecEnv
    env = AtariVecEnv(4, rom="pong", seed=0)
    obs = env.reset()
    assert obs.shape == (4, 84, 84) and obs.dtype == np.uint8
    for _ in range(20):
        obs, rew, term, trunc = env.step(
            np.random.randint(0, env.spec.num_actions, 4))
    assert obs.shape == (4, 84, 84)
    assert set(np.unique(rew)) <= {-1.0, 0.0, 1.0}  # clipped


def test_atari_true_scores_accumulate():
    from rltime_tpu.envs.atari import AtariVecEnv
    env = AtariVecEnv(2, rom="pong", seed=1)
    env.reset()
    for _ in range(3000):
        env.step(np.random.randint(0, env.spec.num_actions, 2))
        if env.completed_scores:
            break
    scores = env.pop_completed_scores()
    assert scores, "no completed game in 3000 steps"
    assert all(s <= 0 for s in scores)  # random pong loses


@pytest.mark.slow
def test_pong_training_smoke(tmp_path):
    """Tiny Pong training loop end-to-end (no learning bar)."""
    from rltime_tpu.config.config import apply_overrides, load_config
    from rltime_tpu.training.trainer import Trainer
    cfg = load_config("pong_dqn")
    cfg = apply_overrides(cfg, [
        "env.num_envs=4", "algo.batch_size=16",
        "replay.steps_per_env=512",
        "train.total_env_steps=2000", "train.warmup_env_steps=500",
        "train.chunk_len=16", "train.log_interval=1000000",
        "model.compute_dtype=float32",
    ])
    t = Trainer(cfg, str(tmp_path / "pong")).train()
    assert t.updates_done > 0
