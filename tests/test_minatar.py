"""MinAtar device-env tests.

The load-bearing test cross-checks the vectorized jnp Breakout step
(rltime_tpu/envs/minatar.py) against an INDEPENDENT scalar
numpy/Python model of the published MinAtar Breakout dynamics
(Young & Tian 2019) over long random action sequences, lane by lane —
any vectorization mistake (branch-order, masking, scatter) diverges
within a few episodes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rltime_tpu.envs.minatar import DeviceBreakout


class ScalarBreakout:
    """Straight-line scalar transcription of MinAtar Breakout."""

    def __init__(self, side: bool):
        self.reset(side)

    def reset(self, side: bool):
        self.ball_y = 3
        self.ball_x, self.ball_dir = (9, 3) if side else (0, 2)
        self.pos = 4
        self.brick_map = np.zeros((10, 10), bool)
        self.brick_map[1:4, :] = True
        self.strike = False
        self.last_x, self.last_y = self.ball_x, self.ball_y

    def step(self, a: int):
        r = 0.0
        if a == 1:
            self.pos = max(0, self.pos - 1)
        elif a == 2:
            self.pos = min(9, self.pos + 1)

        self.last_x, self.last_y = self.ball_x, self.ball_y
        dx, dy = [(-1, -1), (1, -1), (1, 1), (-1, 1)][self.ball_dir]
        new_x, new_y = self.ball_x + dx, self.ball_y + dy

        strike_toggle = False
        terminal = False
        if new_x < 0 or new_x > 9:
            new_x = max(0, min(9, new_x))
            self.ball_dir = [1, 0, 3, 2][self.ball_dir]
        if new_y < 0:
            new_y = 0
            self.ball_dir = [3, 2, 1, 0][self.ball_dir]
        elif self.brick_map[new_y, new_x]:
            strike_toggle = True
            if not self.strike:
                r += 1.0
                self.strike = True
                self.brick_map[new_y, new_x] = False
                new_y = self.last_y
                self.ball_dir = [3, 2, 1, 0][self.ball_dir]
        elif new_y == 9:
            if not self.brick_map.any():
                self.brick_map[1:4, :] = True
            if self.ball_x == self.pos:
                self.ball_dir = [3, 2, 1, 0][self.ball_dir]
                new_y = self.last_y
            elif new_x == self.pos:
                self.ball_dir = [2, 3, 0, 1][self.ball_dir]
                new_y = self.last_y
            else:
                terminal = True
        if not strike_toggle:
            self.strike = False
        self.ball_x, self.ball_y = new_x, new_y
        return r, terminal

    def obs(self):
        o = np.zeros((10, 10, 4), np.uint8)
        o[9, self.pos, 0] = 1
        o[self.ball_y, self.ball_x, 1] = 1
        o[self.last_y, self.last_x, 2] = 1
        o[:, :, 3] = self.brick_map
        return o


def test_vectorized_matches_scalar_model():
    E, T = 8, 600
    env = DeviceBreakout(sticky_prob=0.0, time_limit=10**9)
    step = jax.jit(env.step)
    state = env.reset(jax.random.key(0), E)
    scalars = [ScalarBreakout(bool(state.ball_x[i] == 9))
               for i in range(E)]
    rng = np.random.default_rng(7)
    for t in range(T):
        actions = rng.integers(0, 3, size=(E,)).astype(np.int32)
        state, rew, term, trunc = step(state, jnp.asarray(actions))
        rew, term = np.asarray(rew), np.asarray(term)
        obs = np.asarray(env.observe(state))
        for i, sc in enumerate(scalars):
            r, done = sc.step(int(actions[i]))
            assert r == rew[i], (t, i)
            assert done == term[i], (t, i)
            if done:
                # auto-reset: adopt the vectorized env's fresh side
                sc.reset(bool(state.ball_x[i] == 9))
            assert sc.ball_y == int(state.ball_y[i]), (t, i)
            assert sc.ball_x == int(state.ball_x[i]), (t, i)
            assert sc.ball_dir == int(state.ball_dir[i]), (t, i)
            assert sc.pos == int(state.pos[i]), (t, i)
            assert sc.strike == bool(state.strike[i]), (t, i)
            np.testing.assert_array_equal(
                sc.brick_map, np.asarray(state.brick_map[i]), str((t, i)))
            np.testing.assert_array_equal(sc.obs(), obs[i], str((t, i)))
    # the run must actually exercise scoring and episode ends
    assert sum(s.brick_map.sum() < 30 for s in scalars) > 0


def test_invariants_and_episode_ends():
    E, T = 64, 400
    env = DeviceBreakout(sticky_prob=0.1, time_limit=10**9)
    step = jax.jit(env.step)
    state = env.reset(jax.random.key(1), E)
    key = jax.random.key(2)
    total_term = 0
    total_rew = 0.0
    for _ in range(T):
        key, sub = jax.random.split(key)
        actions = jax.random.randint(sub, (E,), 0, 3)
        state, rew, term, trunc = step(state, actions)
        total_term += int(jnp.sum(term))
        total_rew += float(jnp.sum(rew))
        obs = env.observe(state)
        # exactly one paddle / ball / trail cell per lane
        assert jnp.all(obs[..., 0].sum(axis=(1, 2)) == 1)
        assert jnp.all(obs[..., 1].sum(axis=(1, 2)) == 1)
        assert jnp.all(obs[..., 2].sum(axis=(1, 2)) == 1)
        assert jnp.all((state.ball_y >= 0) & (state.ball_y <= 9))
        assert jnp.all((state.ball_x >= 0) & (state.ball_x <= 9))
        bricks = state.brick_map.sum(axis=(1, 2))
        assert jnp.all((bricks >= 0) & (bricks <= 30))
    assert total_term > 0, "random play must drop the ball sometimes"
    assert total_rew > 0, "random play must hit some bricks"


def test_truncation_resets_and_flags():
    env = DeviceBreakout(sticky_prob=0.0, time_limit=5)
    state = env.reset(jax.random.key(0), 4)
    for t in range(5):
        state, rew, term, trunc = env.step(
            state, jnp.zeros((4,), jnp.int32))
    assert bool(jnp.all(trunc | term))
    assert bool(jnp.all(state.steps == 0))  # lanes reset


def test_minatar_torso_actor_learner_input_consistency():
    """(B,H,W,C) acting input and (B,1,H,W,C) replay gather must hit
    the same params and produce identical Q-values."""
    from rltime_tpu.models.policy import ModelConfig, init_params, make_model
    cfg = ModelConfig(num_actions=3, torso="minatar_cnn",
                      cnn_channels=(16,), cnn_fc=128, head="dueling")
    obs5 = jnp.asarray(
        np.random.default_rng(0).integers(0, 2, (4, 1, 10, 10, 4)),
        jnp.uint8)
    params = init_params(cfg, jax.random.key(0), obs5)
    model = make_model(cfg)
    q5, _ = model.apply(params, obs5, ())
    q4, _ = model.apply(params, obs5[:, 0], ())
    np.testing.assert_allclose(np.asarray(q5), np.asarray(q4), rtol=1e-6)


def test_minatar_trainer_smoke(tmp_path):
    """Full fused pipeline: device Breakout -> replay -> PER DQN update."""
    config = {
        "seed": 0,
        "env": {"type": "minatar_breakout", "num_envs": 16},
        "model": {"torso": "minatar_cnn", "cnn_channels": [16],
                  "cnn_fc": 128, "head": "dueling"},
        "replay": {"steps_per_env": 256, "prioritized": True},
        "algo": {"algo": "dqn", "batch_size": 32, "n_step": 3,
                 "double_q": True, "lr": 3e-4},
        "exploration": {"type": "epsilon_greedy", "mode": "anneal",
                        "eps_start": 1.0, "eps_end": 0.1,
                        "anneal_steps": 2000},
        "train": {"total_env_steps": 4096, "warmup_env_steps": 512,
                  "chunk_len": 16, "updates_per_chunk": 1,
                  "log_interval": 1024},
    }
    from rltime_tpu.training.trainer import Trainer
    tr = Trainer(config, str(tmp_path / "run"))
    m, _ = tr.train_chunk()
    for _ in range(8):
        m, _ = tr.train_chunk()
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["q"]))
