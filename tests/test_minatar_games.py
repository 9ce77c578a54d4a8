"""Golden tests for the Asterix / Freeway / Space Invaders device envs.

Same strategy as tests/test_minatar.py: each vectorized jnp game is
cross-checked lane-by-lane against an INDEPENDENT scalar numpy/Python
model of the dynamics over long random action sequences. Randomness is
handled per game:
  * Space Invaders is deterministic -> pure cross-check.
  * Asterix spawn decisions (slot/side/gold) are read back from the
    vectorized env's dbg_* fields and INJECTED into the scalar model;
    all movement/collision/ramp logic stays independent.
  * Freeway car randomization (on reset / on score) is adopted from
    the vectorized state; between randomizations everything is
    independent.
"""
import jax
import jax.numpy as jnp
import numpy as np

from rltime_tpu.envs.minatar_games import (
    DeviceAsterix, DeviceFreeway, DeviceSpaceInvaders,
)


# ---------------------------------------------------------------------------
# Asterix
# ---------------------------------------------------------------------------

class ScalarAsterix:
    """Straight-line scalar model of MinAtar-style Asterix."""

    def __init__(self, ramping=True, ramp_interval=100):
        self.ramping = ramping
        self.ramp_interval = ramp_interval
        self.reset()

    def reset(self):
        self.px, self.py = 5, 5
        self.entities = [None] * 8          # slot i -> [x, lr, gold]
        self.spawn_speed = 10
        self.spawn_timer = 10
        self.move_speed = 5
        self.move_timer = 5
        self.ramp_timer = self.ramp_interval
        self.ramp_index = 0

    def step(self, a, spawn):
        """spawn: None or (slot, lr, gold), the injected random draw."""
        r, terminal = 0.0, False
        if self.spawn_timer == 0:
            if spawn is not None:
                slot, lr, gold = spawn
                assert self.entities[slot] is None, "spawn into live slot"
                self.entities[slot] = [0 if lr else 9, lr, gold]
            else:
                assert all(e is not None for e in self.entities), \
                    "env skipped a spawn though a slot was free"
            self.spawn_timer = self.spawn_speed
        if a == 1:
            self.px = max(0, self.px - 1)
        elif a == 3:
            self.px = min(9, self.px + 1)
        elif a == 2:
            self.py = max(1, self.py - 1)
        elif a == 4:
            self.py = min(8, self.py + 1)
        for i, e in enumerate(self.entities):
            if e is not None and e[0] == self.px and i + 1 == self.py:
                if e[2]:
                    self.entities[i] = None
                    r += 1.0
                else:
                    terminal = True
        if self.move_timer == 0:
            self.move_timer = self.move_speed
            for i, e in enumerate(self.entities):
                if e is None:
                    continue
                e[0] += 1 if e[1] else -1
                if e[0] < 0 or e[0] > 9:
                    self.entities[i] = None
                    continue
                if e[0] == self.px and i + 1 == self.py:
                    if e[2]:
                        self.entities[i] = None
                        r += 1.0
                    else:
                        terminal = True
        self.spawn_timer -= 1
        self.move_timer -= 1
        if self.ramping and (self.spawn_speed > 1 or self.move_speed > 1):
            if self.ramp_timer >= 0:
                self.ramp_timer -= 1
            else:
                if self.move_speed > 1 and self.ramp_index % 2 == 1:
                    self.move_speed -= 1
                if self.spawn_speed > 1:
                    self.spawn_speed -= 1
                self.ramp_index += 1
                self.ramp_timer = self.ramp_interval
        return r, terminal

    def obs(self):
        o = np.zeros((10, 10, 4), np.uint8)
        o[self.py, self.px, 0] = 1
        for i, e in enumerate(self.entities):
            if e is None:
                continue
            o[i + 1, e[0], 3 if e[2] else 1] = 1
            bx = e[0] - 1 if e[1] else e[0] + 1
            if 0 <= bx <= 9:
                o[i + 1, bx, 2] = 1
        return o


def test_asterix_matches_scalar_model():
    E, T = 8, 700
    env = DeviceAsterix(sticky_prob=0.0, time_limit=10**9)
    step = jax.jit(env.step)
    state = env.reset(jax.random.key(0), E)
    scalars = [ScalarAsterix() for _ in range(E)]
    rng = np.random.default_rng(11)
    golds = deaths = 0
    for t in range(T):
        actions = rng.integers(0, 5, size=(E,)).astype(np.int32)
        state, rew, term, trunc = step(state, jnp.asarray(actions))
        rew, term = np.asarray(rew), np.asarray(term)
        spawned = np.asarray(state.dbg_spawned)
        slot = np.asarray(state.dbg_slot)
        s_lr = np.asarray(state.dbg_lr)
        s_gold = np.asarray(state.dbg_gold)
        obs = np.asarray(env.observe(state))
        for i, sc in enumerate(scalars):
            spawn = ((int(slot[i]), bool(s_lr[i]), bool(s_gold[i]))
                     if spawned[i] else None)
            r, done = sc.step(int(actions[i]), spawn)
            assert r == rew[i], (t, i)
            assert done == term[i], (t, i)
            golds += int(r)
            deaths += int(done)
            if done:
                sc.reset()
            assert sc.px == int(state.px[i]), (t, i)
            assert sc.py == int(state.py[i]), (t, i)
            assert sc.spawn_speed == int(state.spawn_speed[i]), (t, i)
            assert sc.spawn_timer == int(state.spawn_timer[i]), (t, i)
            assert sc.move_speed == int(state.move_speed[i]), (t, i)
            assert sc.move_timer == int(state.move_timer[i]), (t, i)
            assert sc.ramp_index == int(state.ramp_index[i]), (t, i)
            assert sc.ramp_timer == int(state.ramp_timer[i]), (t, i)
            for s in range(8):
                alive = sc.entities[s] is not None
                assert alive == bool(state.ent_alive[i, s]), (t, i, s)
                if alive:
                    x, lr, gold = sc.entities[s]
                    assert x == int(state.ent_x[i, s]), (t, i, s)
                    assert lr == bool(state.ent_lr[i, s]), (t, i, s)
                    assert gold == bool(state.ent_gold[i, s]), (t, i, s)
            np.testing.assert_array_equal(sc.obs(), obs[i], str((t, i)))
    # the run must actually exercise scoring and dying
    assert golds > 0 and deaths > 0


def _asterix_golden_run(env, scalars, T, seed, n_actions=5):
    """Shared lockstep driver: step env + scalars, compare key fields."""
    E = len(scalars)
    step = jax.jit(env.step)
    state = env.reset(jax.random.key(seed), E)
    rng = np.random.default_rng(seed)
    for t in range(T):
        actions = rng.integers(0, n_actions, size=(E,)).astype(np.int32)
        state, rew, term, trunc = step(state, jnp.asarray(actions))
        rew, term = np.asarray(rew), np.asarray(term)
        spawned = np.asarray(state.dbg_spawned)
        slot = np.asarray(state.dbg_slot)
        s_lr = np.asarray(state.dbg_lr)
        s_gold = np.asarray(state.dbg_gold)
        for i, sc in enumerate(scalars):
            spawn = ((int(slot[i]), bool(s_lr[i]), bool(s_gold[i]))
                     if spawned[i] else None)
            r, done = sc.step(int(actions[i]), spawn)
            assert r == rew[i] and done == term[i], (t, i)
            if done:
                sc.reset()
            assert sc.spawn_speed == int(state.spawn_speed[i]), (t, i)
            assert sc.move_speed == int(state.move_speed[i]), (t, i)
            assert sc.ramp_index == int(state.ramp_index[i]), (t, i)
            assert sc.ramp_timer == int(state.ramp_timer[i]), (t, i)
    return scalars


def test_asterix_ramping_fires_and_matches():
    """Short ramp interval so difficulty ramps actually trigger (under
    random play lanes rarely survive the published 100-step interval);
    the scalar model must track every speed change."""
    E = 8
    env = DeviceAsterix(sticky_prob=0.0, time_limit=10**9,
                        ramp_interval=5)
    scalars = [ScalarAsterix(ramp_interval=5) for _ in range(E)]
    scalars = _asterix_golden_run(env, scalars, T=400, seed=23)
    assert any(sc.ramp_index > 0 for sc in scalars)
    assert any(sc.spawn_speed < 10 for sc in scalars)


def test_asterix_ramping_off():
    env = DeviceAsterix(sticky_prob=0.0, time_limit=10**9,
                        ramping=False, ramp_interval=5)
    scalars = [ScalarAsterix(ramping=False, ramp_interval=5)
               for _ in range(8)]
    scalars = _asterix_golden_run(env, scalars, T=200, seed=29)
    assert all(sc.ramp_index == 0 for sc in scalars)
    assert all(sc.spawn_speed == 10 and sc.move_speed == 5
               for sc in scalars)


# ---------------------------------------------------------------------------
# Freeway
# ---------------------------------------------------------------------------

class ScalarFreeway:
    """Straight-line scalar model of MinAtar-style Freeway."""

    def __init__(self, cars):
        self.pos = 9
        self.move_timer = 3
        self.cars = [list(c) for c in cars]   # [x, timer, speed] per row

    def step(self, a, post_cars=None):
        """post_cars: env's post-step car state, adopted on scoring
        steps (fresh cars can neither move nor collide that step, so
        adopting the post-step values equals randomize-then-update)."""
        r = 0.0
        if self.move_timer == 0 and a != 0:
            self.move_timer = 3
            if a == 1:
                self.pos = max(0, self.pos - 1)
            elif a == 2:
                self.pos = min(9, self.pos + 1)
        if self.pos == 0:
            r += 1.0
            self.pos = 9
            assert post_cars is not None
            self.cars = [list(c) for c in post_cars]
            self.move_timer = max(0, self.move_timer - 1)
            return r
        for i, car in enumerate(self.cars):
            if car[0] == 4 and i + 1 == self.pos:
                self.pos = 9
            if car[1] == 0:
                car[1] = abs(car[2])
                car[0] += 1 if car[2] > 0 else -1
                car[0] %= 10
                if car[0] == 4 and i + 1 == self.pos:
                    self.pos = 9
            else:
                car[1] -= 1
        self.move_timer = max(0, self.move_timer - 1)
        return r

    def obs(self):
        o = np.zeros((10, 10, 7), np.uint8)
        o[self.pos, 4, 0] = 1
        for i, car in enumerate(self.cars):
            o[i + 1, car[0], 1] = 1
            bx = (car[0] - 1 if car[2] > 0 else car[0] + 1) % 10
            o[i + 1, bx, 1 + abs(car[2])] = 1
        return o


def _cars_of(state, i):
    return [[int(state.car_x[i, s]), int(state.car_timer[i, s]),
             int(state.car_speed[i, s])] for s in range(8)]


def test_freeway_matches_scalar_model():
    E, T = 8, 700
    env = DeviceFreeway(sticky_prob=0.0, time_limit=10**9)
    step = jax.jit(env.step)
    state = env.reset(jax.random.key(3), E)
    scalars = [ScalarFreeway(_cars_of(state, i)) for i in range(E)]
    rng = np.random.default_rng(5)
    crossings = 0
    # biased-up policy so crossings actually happen under random play
    for t in range(T):
        actions = rng.choice([0, 1, 1, 1, 2], size=(E,)).astype(np.int32)
        state, rew, term, trunc = step(state, jnp.asarray(actions))
        rew = np.asarray(rew)
        obs = np.asarray(env.observe(state))
        for i, sc in enumerate(scalars):
            post = _cars_of(state, i)
            r = sc.step(int(actions[i]), post_cars=post)
            assert r == rew[i], (t, i)
            crossings += int(r)
            assert sc.pos == int(state.pos[i]), (t, i)
            assert sc.move_timer == int(state.move_timer[i]), (t, i)
            if r == 0:   # scoring steps adopted the env's cars
                assert sc.cars == post, (t, i)
            np.testing.assert_array_equal(sc.obs(), obs[i], str((t, i)))
        assert not np.asarray(term).any()  # no terminal before limit
    assert crossings > 0, "biased-up play must cross sometimes"


def test_freeway_time_limit_is_termination():
    env = DeviceFreeway(sticky_prob=0.0, time_limit=4)
    state = env.reset(jax.random.key(0), 4)
    for _ in range(4):
        state, rew, term, trunc = env.step(
            state, jnp.zeros((4,), jnp.int32))
    assert bool(jnp.all(term))          # published game: terminal
    assert not bool(jnp.any(trunc))
    assert bool(jnp.all(state.steps == 0))


# ---------------------------------------------------------------------------
# Space Invaders
# ---------------------------------------------------------------------------

class ScalarSpaceInvaders:
    """Straight-line scalar model of MinAtar-style Space Invaders."""

    def __init__(self, ramping=True):
        self.ramping = ramping
        self.interval = 12
        self.reset()

    def reset(self):
        self.pos = 5
        self.f = np.zeros((10, 10), bool)
        self.e = np.zeros((10, 10), bool)
        self.aliens = np.zeros((10, 10), bool)
        self.aliens[0:4, 2:8] = True
        self.dir = -1
        self.interval = 12
        self.move_timer = 12
        self.alien_shot_timer = 10
        self.shot_timer = 0

    def step(self, a):
        r, terminal = 0.0, False
        if a == 3 and self.shot_timer == 0:
            self.f[9, self.pos] = True
            self.shot_timer = 5
        elif a == 1:
            self.pos = max(0, self.pos - 1)
        elif a == 2:
            self.pos = min(9, self.pos + 1)
        self.f = np.roll(self.f, -1, axis=0)
        self.f[9, :] = False
        self.e = np.roll(self.e, 1, axis=0)
        self.e[0, :] = False
        if self.e[9, self.pos]:
            terminal = True
        if self.move_timer == 0:
            self.move_timer = min(int(self.aliens.sum()), self.interval)
            if (self.aliens[:, 0].any() and self.dir < 0) or \
               (self.aliens[:, 9].any() and self.dir > 0):
                self.dir = -self.dir
                if self.aliens[9, :].any():
                    terminal = True
                self.aliens = np.roll(self.aliens, 1, axis=0)
            else:
                self.aliens = np.roll(self.aliens, self.dir, axis=1)
            if self.aliens[9, self.pos]:
                terminal = True
        if self.alien_shot_timer == 0:
            self.alien_shot_timer = 10
            for c in sorted(range(10), key=lambda c: abs(c - self.pos)):
                if self.aliens[:, c].any():
                    row = int(np.max(np.nonzero(self.aliens[:, c])[0]))
                    self.e[row, c] = True
                    break
        kills = self.aliens & self.f
        r += float(kills.sum())
        self.aliens &= ~kills
        self.f &= ~kills
        if self.shot_timer > 0:
            self.shot_timer -= 1
        self.move_timer -= 1
        self.alien_shot_timer -= 1
        if not self.aliens.any():
            if self.interval > 6 and self.ramping:
                self.interval -= 1
            self.aliens[0:4, 2:8] = True
        return r, terminal

    def obs(self):
        o = np.zeros((10, 10, 6), np.uint8)
        o[9, self.pos, 0] = 1
        o[:, :, 1] = self.aliens
        o[:, :, 2 if self.dir < 0 else 3] = self.aliens
        o[:, :, 4] = self.f
        o[:, :, 5] = self.e
        return o


def test_space_invaders_matches_scalar_model():
    E, T = 8, 800
    env = DeviceSpaceInvaders(sticky_prob=0.0, time_limit=10**9)
    step = jax.jit(env.step)
    state = env.reset(jax.random.key(0), E)
    scalars = [ScalarSpaceInvaders() for _ in range(E)]
    rng = np.random.default_rng(13)
    kills = deaths = 0
    for t in range(T):
        actions = rng.integers(0, 4, size=(E,)).astype(np.int32)
        state, rew, term, trunc = step(state, jnp.asarray(actions))
        rew, term = np.asarray(rew), np.asarray(term)
        obs = np.asarray(env.observe(state))
        for i, sc in enumerate(scalars):
            r, done = sc.step(int(actions[i]))
            assert r == rew[i], (t, i)
            assert done == term[i], (t, i)
            kills += int(r)
            deaths += int(done)
            if done:
                sc.reset()
            assert sc.pos == int(state.pos[i]), (t, i)
            assert sc.dir == int(state.alien_dir[i]), (t, i)
            assert sc.interval == int(state.enemy_move_interval[i]), (t, i)
            assert sc.move_timer == int(state.alien_move_timer[i]), (t, i)
            assert sc.shot_timer == int(state.shot_timer[i]), (t, i)
            assert sc.alien_shot_timer == \
                int(state.alien_shot_timer[i]), (t, i)
            np.testing.assert_array_equal(
                sc.aliens, np.asarray(state.aliens[i]), str((t, i)))
            np.testing.assert_array_equal(
                sc.f, np.asarray(state.f_bullets[i]), str((t, i)))
            np.testing.assert_array_equal(
                sc.e, np.asarray(state.e_bullets[i]), str((t, i)))
            np.testing.assert_array_equal(sc.obs(), obs[i], str((t, i)))
    assert kills > 0 and deaths > 0


# ---------------------------------------------------------------------------
# shared plumbing
# ---------------------------------------------------------------------------

def test_registry_handles_and_specs():
    from rltime_tpu.config.config import build
    for name, (ch, acts) in {
        "minatar_asterix": (4, 5),
        "minatar_freeway": (7, 3),
        "minatar_space_invaders": (6, 4),
        "minatar_seaquest": (10, 6),
    }.items():
        h = build({"type": name, "num_envs": 4})
        assert h.spec.obs_shape == (10, 10, ch)
        assert h.spec.num_actions == acts
        assert h.is_device


def test_asterix_trainer_smoke(tmp_path):
    """Fused device pipeline on the busiest new game."""
    config = {
        "seed": 0,
        "env": {"type": "minatar_asterix", "num_envs": 16},
        "model": {"torso": "minatar_cnn", "cnn_channels": [16],
                  "cnn_fc": 128, "head": "dueling"},
        "replay": {"steps_per_env": 256, "prioritized": True},
        "algo": {"algo": "dqn", "batch_size": 32, "n_step": 3,
                 "double_q": True, "lr": 3e-4},
        "exploration": {"type": "epsilon_greedy", "mode": "anneal",
                        "eps_start": 1.0, "eps_end": 0.1,
                        "anneal_steps": 2000},
        "train": {"total_env_steps": 3072, "warmup_env_steps": 512,
                  "chunk_len": 16, "updates_per_chunk": 1,
                  "log_interval": 1024},
    }
    from rltime_tpu.training.trainer import Trainer
    tr = Trainer(config, str(tmp_path / "run"))
    m = {}
    for _ in range(8):
        m, _ = tr.train_chunk()
    assert np.isfinite(float(m["loss"]))


def _device_cfg(algo, game="minatar_breakout", **model_over):
    """Device-env trainer config exercising DeviceActor's algo paths."""
    model = {"torso": "minatar_cnn", "cnn_channels": [8], "cnn_fc": 32,
             "head": "dueling", "dueling_hidden": 8}
    model.update(model_over)
    return {
        "seed": 0,
        "env": {"type": game, "num_envs": 8},
        "model": model,
        "replay": {"steps_per_env": 256, "prioritized": True},
        "algo": {"algo": algo, "batch_size": 8, "n_step": 3,
                 "double_q": True, "lr": 1e-3,
                 "target_update_freq": 10,
                 **({"num_tau": 4, "num_tau_prime": 4} if algo == "iqn"
                    else {}),
                 **({"burn_in": 4, "seq_len": 8} if algo == "r2d2"
                    else {})},
        "exploration": {"type": "epsilon_greedy", "eps_start": 1.0,
                        "eps_end": 0.1, "anneal_steps": 500},
        "train": {"total_env_steps": 1024, "warmup_env_steps": 384,
                  "chunk_len": 16, "updates_per_chunk": 1,
                  "log_interval": 10_000,
                  "checkpoint_interval": 10_000},
    }


def test_device_r2d2_pipeline(tmp_path):
    """R2D2 fully on-device: fused acting records LSTM state into the
    replay chunk, sequence replay consumes stored state + burn-in."""
    from rltime_tpu.training.trainer import Trainer
    cfg = _device_cfg("r2d2", head="linear", lstm_size=8)
    t = Trainer(cfg, str(tmp_path / "r")).train()
    assert t.updates_done > 0
    assert "rnn_c" in t.replay_state.storage
    assert t.replay_state.storage["rnn_c"].shape == (8, 256, 8)


def test_device_iqn_pipeline(tmp_path):
    """IQN on-device: fused acting samples policy taus inside the scan."""
    from rltime_tpu.training.trainer import Trainer
    cfg = _device_cfg("iqn", game="minatar_space_invaders", head="iqn",
                      iqn_embed_dim=8, num_tau=4, num_tau_prime=4,
                      num_tau_policy=4)
    t = Trainer(cfg, str(tmp_path / "i")).train()
    assert t.updates_done > 0
