"""Training THROUGH the real Atari wrapper stack (VERDICT r4 Next #6).

test_atari_stub.py proves `envs/atari.py`'s wrapper mechanics against
a scripted FakeALE; this file goes the last in-sandbox inch: a tiny
LEARNABLE deterministic game (paddle-catch on the real 210x160 RGB
screen) exposed through the mirrored `ale_py.ALEInterface` API, driven
end-to-end by AtariVecEnv + the default Trainer — noop/fire reset,
frameskip max-pool seam, EpisodicLife, grayscale+84x84 resize,
frame-stack gather, PER, the whole config-#2 pipeline — to a score
threshold no random policy reaches. Only the emulator binary itself
remains unexercised (no ale_py in-sandbox).
"""
import sys
import types

import numpy as np
import pytest


class CatchALE:
    """Paddle-catch with the exact ale_py.ALEInterface API surface.

    A 14px ball falls from the top of the 210x160 screen; a 28px-wide
    paddle slides along the bottom. Catch => reward 1; miss => lose a
    life (3 lives; EpisodicLife turns each into a `terminated`).
    Game over after 3 misses or `max_drops` balls. Ball column is
    drawn from the lane's seeded RNG — lanes decorrelate, runs stay
    deterministic.
    """

    H, W = 210, 160
    BALL, PAD = 14, 28
    BALL_VY = 4          # rows per emulator frame (16/env step @skip 4)
    PAD_VX = 12          # px per emulator frame while RIGHT/LEFT held
    PAD_TOP = 196
    MAX_DROPS = 12

    def __init__(self):
        self._seed = 0
        self.rng = np.random.default_rng(0)
        self.reset_game()

    # --- config API ---
    def setInt(self, name, v):
        if name == "random_seed":
            self._seed = int(v)
            self.rng = np.random.default_rng(self._seed)

    def setFloat(self, *a):
        pass

    def loadROM(self, rom):
        self.rom = rom

    # --- emulator API used by envs/atari.py:_AtariLane ---
    def getMinimalActionSet(self):
        return [0, 1, 3, 4]          # NOOP, FIRE, RIGHT, LEFT

    def getScreenDims(self):
        return (self.H, self.W)

    def getScreenRGB(self, buf):
        buf[:] = 0
        y, x = int(self.ball_y), int(self.ball_x)
        if y < self.PAD_TOP:
            buf[y:y + self.BALL, x:x + self.BALL] = 255
        p = int(self.pad_x)
        buf[self.PAD_TOP:self.PAD_TOP + 10, p:p + self.PAD] = 255

    def reset_game(self):
        self._lives = 3
        self._over = False
        self.drops = 0
        self.pad_x = (self.W - self.PAD) // 2
        self._new_ball()

    def _new_ball(self):
        self.ball_y = 0
        self.ball_x = int(self.rng.integers(0, self.W - self.BALL))

    def act(self, a):
        if self._over:
            return 0.0
        if a == 3:
            self.pad_x = min(self.pad_x + self.PAD_VX,
                             self.W - self.PAD)
        elif a == 4:
            self.pad_x = max(self.pad_x - self.PAD_VX, 0)
        self.ball_y += self.BALL_VY
        reward = 0.0
        if self.ball_y + self.BALL >= self.PAD_TOP:
            caught = (self.ball_x + self.BALL > self.pad_x
                      and self.ball_x < self.pad_x + self.PAD)
            if caught:
                reward = 1.0
            else:
                self._lives -= 1
            self.drops += 1
            if self._lives <= 0 or self.drops >= self.MAX_DROPS:
                self._over = True
            else:
                self._new_ball()
        return reward

    def game_over(self):
        return self._over

    def lives(self):
        return self._lives


@pytest.fixture
def atari_mod(monkeypatch):
    import rltime_tpu.envs.atari as mod
    fake = types.ModuleType("ale_py")
    fake.ALEInterface = CatchALE
    fake.roms = types.SimpleNamespace(catch="catch-rom")
    monkeypatch.setitem(sys.modules, "ale_py", fake)
    monkeypatch.setattr(mod, "_HAS_ALE", True)
    return mod


def test_catch_game_visible_after_preprocess(atari_mod):
    """Ball and paddle survive grayscale+84x84 downsampling."""
    lane = atari_mod._AtariLane(
        rom="catch", seed=0, noop_max=5, frameskip=4,
        episodic_life=True, fire_reset=True, max_episode_frames=10_000)
    frame = lane.reset_episode()
    assert frame.shape == (84, 84)
    assert (frame > 100).sum() >= 20          # ball + paddle pixels
    # paddle row band lit near the bottom
    assert (frame[75:83] > 100).any()


def test_catch_rewards_reachable(atari_mod):
    """A scripted follow-the-ball policy scores (the game is winnable
    through the wrapper), a never-move policy mostly doesn't."""
    env = atari_mod.AtariVecEnv(num_envs=1, rom="catch", seed=1,
                                noop_max=2)
    env.reset()
    ale = env._lanes[0].ale
    total = 0.0
    for _ in range(400):
        a = 2 if ale.ball_x > ale.pad_x else 3   # RIGHT else LEFT
        _, r, _, _ = env.step(np.array([a]))
        total += float(r[0])
    assert total >= 8, total


def test_trainer_channels_last_constructs_and_trains(atari_mod,
                                                     tmp_path):
    """model.channels_last through the real Trainer: init example obs
    must be NHWC (code-review r5 finding: NCHW example made conv_0
    see a height-4 image and crash at construction)."""
    from rltime_tpu.training.trainer import Trainer
    cfg = {
        "seed": 0,
        "env": {"type": "atari", "num_envs": 2, "rom": "catch",
                "noop_max": 2},
        "frame_stack": 4,
        "model": {"torso": "nature_cnn", "cnn_channels": [4, 4, 4],
                  "cnn_fc": 16, "head": "dueling",
                  "dueling_hidden": 8, "compute_dtype": "float32",
                  "channels_last": True},
        "replay": {"steps_per_env": 64, "prioritized": True},
        "algo": {"algo": "dqn", "batch_size": 4, "n_step": 2,
                 "lr": 1e-3, "target_update_freq": 10},
        "train": {"total_env_steps": 10**9, "warmup_env_steps": 0,
                  "chunk_len": 8, "updates_per_chunk": 1,
                  "log_interval": 10**9, "track_best": False},
    }
    t = Trainer(cfg, str(tmp_path / "cl"))
    for _ in range(2):
        m, _ = t.train_chunk()
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_dqn_learns_catch_through_atari_stack(atari_mod, tmp_path):
    """Config-#2-shaped DQN (Nature CNN, PER, n-step, double/dueling,
    frame-stack 4) learns paddle-catch THROUGH AtariVecEnv to a true
    game score no random policy reaches (random ~0.7, threshold 3.0,
    ceiling 12)."""
    from rltime_tpu.training.trainer import Trainer

    cfg = {
        "seed": 0,
        "env": {"type": "atari", "num_envs": 16, "rom": "catch",
                "noop_max": 5},
        "frame_stack": 4,
        "model": {"torso": "nature_cnn", "cnn_channels": [8, 16, 16],
                  "cnn_fc": 64, "head": "dueling",
                  "dueling_hidden": 64, "compute_dtype": "float32"},
        "replay": {"steps_per_env": 512, "prioritized": True},
        "algo": {"algo": "dqn", "batch_size": 32, "n_step": 3,
                 "double_q": True, "lr": 1e-3,
                 "target_update_freq": 100},
        "exploration": {"type": "epsilon_greedy", "eps_start": 1.0,
                        "eps_end": 0.02, "anneal_steps": 25_000},
        "train": {"total_env_steps": 60_000, "warmup_env_steps": 2_000,
                  "chunk_len": 16, "updates_per_chunk": 8,
                  "log_interval": 20_000, "checkpoint_interval": 10**9,
                  "track_best": False},
    }
    t = Trainer(cfg, str(tmp_path / "catch")).train()

    # Greedy evaluation through the SAME wrapper stack.
    import jax
    import jax.numpy as jnp
    from rltime_tpu.models.policy import make_model
    model = make_model(t.model_cfg)
    env = t.env.inner if hasattr(t.env, "inner") else t.env

    eval_env = atari_mod.AtariVecEnv(num_envs=8, rom="catch",
                                     seed=123, noop_max=5)
    obs = eval_env.reset()
    frames = np.zeros((8, 4, 84, 84), np.uint8)
    frames[:, -1] = obs

    @jax.jit
    def greedy(params, stack):
        q, _ = model.apply(params, jnp.asarray(stack), ())
        return jnp.argmax(q, axis=-1)

    scores = []
    for _ in range(600):
        a = np.asarray(greedy(t.train_state.params, frames))
        obs, _, term, trunc = eval_env.step(a)
        done = term | trunc
        frames = np.roll(frames, -1, axis=1)
        frames[:, -1] = obs
        frames[done, :-1] = 0      # reset stack on episode boundary
        scores.extend(eval_env.pop_completed_scores())
        if len(scores) >= 16:
            break
    assert len(scores) >= 8, "eval produced too few completed games"
    mean = float(np.mean(scores))
    assert mean >= 3.0, f"greedy true-score mean {mean} ({scores})"
