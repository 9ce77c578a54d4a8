"""Atari-shaped pipeline without ALE: uint8 image obs + frame stack 4
+ Nature CNN through the full trainer (SURVEY.md §4 item 2)."""
import jax
import numpy as np
import pytest

from rltime_tpu.training.trainer import Trainer


def _img_cfg(algo="dqn", **model_over):
    model = {"torso": "nature_cnn", "cnn_channels": [4, 4, 4],
             "cnn_fc": 16, "head": "dueling", "dueling_hidden": 8}
    model.update(model_over)
    return {
        "seed": 0,
        "env": {"type": "counting_env", "num_envs": 2,
                "episode_len": 11, "image_obs": True},
        "frame_stack": 4,
        "model": model,
        "replay": {"steps_per_env": 128, "prioritized": True},
        "algo": {"algo": algo, "batch_size": 4, "n_step": 3,
                 "double_q": True, "lr": 1e-3,
                 "target_update_freq": 10,
                 **({"num_tau": 4, "num_tau_prime": 4} if algo == "iqn"
                    else {}),
                 **({"burn_in": 4, "seq_len": 8} if algo == "r2d2"
                    else {})},
        "exploration": {"type": "epsilon_greedy", "eps_start": 1.0,
                        "eps_end": 0.1, "anneal_steps": 200},
        "train": {"total_env_steps": 400, "warmup_env_steps": 150,
                  "chunk_len": 8, "updates_per_chunk": 1,
                  "log_interval": 10_000,
                  "checkpoint_interval": 10_000},
    }


def test_image_dqn_pipeline(tmp_path):
    t = Trainer(_img_cfg("dqn"), str(tmp_path / "d")).train()
    assert t.updates_done > 0
    # obs stored as uint8 single frames (4x memory saving vs stacks)
    assert t.replay_state.storage["obs"].dtype.name == "uint8"
    assert t.replay_state.storage["obs"].shape == (2, 128, 84, 84)


def test_image_iqn_pipeline(tmp_path):
    cfg = _img_cfg("iqn", head="iqn", iqn_embed_dim=8,
                   num_tau=4, num_tau_prime=4, num_tau_policy=4)
    t = Trainer(cfg, str(tmp_path / "i")).train()
    assert t.updates_done > 0


def test_image_r2d2_pipeline(tmp_path):
    cfg = _img_cfg("r2d2", lstm_size=8)
    cfg["replay"]["steps_per_env"] = 256
    t = Trainer(cfg, str(tmp_path / "r")).train()
    assert t.updates_done > 0
    assert "rnn_c" in t.replay_state.storage


def test_actor_frame_stack_matches_replay_reconstruction(tmp_path):
    """The stack the CNN saw when ACTING at step t must equal the
    stack the LEARNER reconstructs for column t — else train/act obs
    distributions diverge (SURVEY.md §7 hard part 2)."""
    import jax.numpy as jnp
    from rltime_tpu.history.replay import (
        ReplayConfig, frame_stack_gather, replay_init, replay_insert,
    )
    from rltime_tpu.envs.fake import CountingVecEnv
    from rltime_tpu.models.policy import ModelConfig
    from rltime_tpu.acting.actor import Actor
    from rltime_tpu.exploration.epsilon import EpsilonGreedy

    env = CountingVecEnv(2, episode_len=6, image_obs=True)
    mcfg = ModelConfig(num_actions=3, torso="nature_cnn",
                       cnn_channels=(2, 2, 2), cnn_fc=8, head="linear")
    actor = Actor(env, mcfg, 4, EpsilonGreedy(eps_start=1.0),
                  jax.random.key(0), chunk_len=16)
    rcfg = ReplayConfig(num_envs=2, steps_per_env=64, horizon=1,
                        chunk_len=16, lookback=3, prioritized=False)
    fields = {"obs": ((84, 84), jnp.uint8), "done": ((), jnp.bool_)}
    rstate = replay_init(rcfg, fields)

    # roll one chunk; capture actor-side stacks at each step
    from rltime_tpu.models.policy import init_params
    params = init_params(mcfg, jax.random.key(1),
                         jnp.zeros((1, 4, 84, 84), jnp.uint8))
    stacks = []
    chunk, _ = actor.rollout(params, 16)
    rstate = replay_insert(rcfg, rstate, {
        "obs": chunk["obs"], "done": chunk["done"]})
    # replay reconstruction at every column of env 0
    for col in range(16):
        stk = frame_stack_gather(rcfg, rstate, jnp.array([0]),
                                 jnp.array([col]), 4)
        # actor-side reference: zero-padded stack from raw chunk
        frames = []
        for j in range(3, -1, -1):
            src = col - j
            # done at col c means cols > c are a new episode
            crossed = any(chunk["done"][0, k]
                          for k in range(max(src, 0), col))
            if src < 0 or crossed:
                frames.append(np.zeros((84, 84), np.uint8))
            else:
                frames.append(chunk["obs"][0, src])
        np.testing.assert_array_equal(np.asarray(stk[0]),
                                      np.stack(frames))
