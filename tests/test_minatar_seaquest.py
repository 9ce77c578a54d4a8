"""Golden tests for the device-resident Seaquest env.

Same strategy as tests/test_minatar_games.py: the vectorized jnp game
is cross-checked lane-by-lane against an INDEPENDENT scalar Python
model over long random action sequences. Spawn randomness (enemy
side/row/kind, diver side/row) is read back from the env's dbg_*
fields and INJECTED into the scalar model; all movement, collision,
pickup, oxygen and ramp logic stays independent. Surfacing mechanics
that random play rarely reaches (6-diver cash-in, partial surfacing,
no-diver death, oxygen death) get scripted state-injection tests.
"""
import jax
import jax.numpy as jnp
import numpy as np

from rltime_tpu.envs.minatar_seaquest import (
    DIVER_MOVE_INTERVAL, DIVER_SPAWN_SPEED, ENEMY_SHOT_INTERVAL,
    INIT_MOVE_INTERVAL, INIT_SPAWN_SPEED, MAX_OXYGEN, N_DIV, N_EBUL,
    N_ESUB, N_FBUL, N_FISH, SHOT_COOL_DOWN, DeviceSeaquest,
)


class ScalarSeaquest:
    """Straight-line scalar model of the documented Seaquest dynamics
    (slot semantics as in envs/minatar_seaquest.py's docstring)."""

    def __init__(self, ramping=True):
        self.ramping = ramping
        self.reset()

    def reset(self):
        self.sub_x, self.sub_y, self.sub_or = 5, 0, False
        self.shot_timer = 0
        self.oxygen = MAX_OXYGEN
        self.held = 0
        self.surface = True
        self.fb = [None] * N_FBUL      # [x, y, right]
        self.fish = [None] * N_FISH    # [x, y, right, t]
        self.esub = [None] * N_ESUB    # [x, y, right, t, shot_t]
        self.ebul = [None] * N_EBUL    # [x, y, right]
        self.div = [None] * N_DIV      # [x, y, right, t]
        self.e_spawn_speed = INIT_SPAWN_SPEED
        self.e_spawn_timer = INIT_SPAWN_SPEED
        self.d_spawn_timer = DIVER_SPAWN_SPEED
        self.move_speed = INIT_MOVE_INTERVAL
        self.ramp_index = 0

    @staticmethod
    def _first_free(slots):
        for i, s in enumerate(slots):
            if s is None:
                return i
        return None

    def step(self, a, e_spawn, d_spawn):
        r, terminal = 0.0, False
        # 1) enemy spawn
        if self.e_spawn_timer == 0:
            if e_spawn is not None:
                lr, row, is_sub = e_spawn
                fam = self.esub if is_sub else self.fish
                i = self._first_free(fam)
                assert i is not None, "env spawned into a full family"
                x = 0 if lr else 9
                fam[i] = ([x, row, lr, self.move_speed,
                           ENEMY_SHOT_INTERVAL] if is_sub
                          else [x, row, lr, self.move_speed])
            self.e_spawn_timer = self.e_spawn_speed
        # 2) diver spawn
        if self.d_spawn_timer == 0:
            if d_spawn is not None:
                lr, row = d_spawn
                i = self._first_free(self.div)
                assert i is not None, "env spawned diver into full slots"
                self.div[i] = [0 if lr else 9, row, lr,
                               DIVER_MOVE_INTERVAL]
            self.d_spawn_timer = DIVER_SPAWN_SPEED
        # 3) action
        if a == 5:
            if self.shot_timer == 0:
                i = self._first_free(self.fb)
                if i is not None:
                    self.fb[i] = [self.sub_x, self.sub_y, self.sub_or]
                self.shot_timer = SHOT_COOL_DOWN
        elif a == 1:
            self.sub_x = max(0, self.sub_x - 1)
            self.sub_or = False
        elif a == 2:
            self.sub_y = max(0, self.sub_y - 1)
        elif a == 3:
            self.sub_x = min(9, self.sub_x + 1)
            self.sub_or = True
        elif a == 4:
            self.sub_y = min(8, self.sub_y + 1)
        # 4) friendly bullets: move, die off-board, kill every enemy
        #    on the landing cell
        for i, b in enumerate(self.fb):
            if b is None:
                continue
            b[0] += 1 if b[2] else -1
            if b[0] < 0 or b[0] > 9:
                self.fb[i] = None
                continue
            hit = False
            for j, f in enumerate(self.fish):
                if f is not None and f[0] == b[0] and f[1] == b[1]:
                    self.fish[j] = None
                    r += 1.0
                    hit = True
            for j, s in enumerate(self.esub):
                if s is not None and s[0] == b[0] and s[1] == b[1]:
                    self.esub[j] = None
                    r += 1.0
                    hit = True
            if hit:
                self.fb[i] = None
        # 5) divers: pickup / move on timer (+pickup), slot order
        for i, d in enumerate(self.div):
            if d is None:
                continue
            if d[0] == self.sub_x and d[1] == self.sub_y and self.held < 6:
                self.div[i] = None
                self.held += 1
            elif d[3] == 0:
                d[3] = DIVER_MOVE_INTERVAL
                d[0] += 1 if d[2] else -1
                if d[0] < 0 or d[0] > 9:
                    self.div[i] = None
                elif (d[0] == self.sub_x and d[1] == self.sub_y
                      and self.held < 6):
                    self.div[i] = None
                    self.held += 1
            else:
                d[3] -= 1
        # 6) fish: contact (every step + after own move) is terminal
        for i, f in enumerate(self.fish):
            if f is None:
                continue
            if f[0] == self.sub_x and f[1] == self.sub_y:
                terminal = True
            if f[3] == 0:
                f[3] = self.move_speed
                f[0] += 1 if f[2] else -1
                if f[0] < 0 or f[0] > 9:
                    self.fish[i] = None
                elif f[0] == self.sub_x and f[1] == self.sub_y:
                    terminal = True
            else:
                f[3] -= 1
        # 7) enemy subs: march like fish, then fire from post-move cell
        for i, s in enumerate(self.esub):
            if s is None:
                continue
            if s[0] == self.sub_x and s[1] == self.sub_y:
                terminal = True
            if s[3] == 0:
                s[3] = self.move_speed
                s[0] += 1 if s[2] else -1
                if s[0] < 0 or s[0] > 9:
                    self.esub[i] = None
                    continue
                if s[0] == self.sub_x and s[1] == self.sub_y:
                    terminal = True
            else:
                s[3] -= 1
            if s[4] == 0:
                s[4] = ENEMY_SHOT_INTERVAL
                j = self._first_free(self.ebul)
                if j is not None:
                    self.ebul[j] = [s[0], s[1], s[2]]
            else:
                s[4] -= 1
        # 8) enemy bullets (incl. just fired): pre+post contact kills
        for i, b in enumerate(self.ebul):
            if b is None:
                continue
            if b[0] == self.sub_x and b[1] == self.sub_y:
                terminal = True
            b[0] += 1 if b[2] else -1
            if b[0] < 0 or b[0] > 9:
                self.ebul[i] = None
            elif b[0] == self.sub_x and b[1] == self.sub_y:
                terminal = True
        # 9) guarded decrements
        if self.e_spawn_timer > 0:
            self.e_spawn_timer -= 1
        if self.d_spawn_timer > 0:
            self.d_spawn_timer -= 1
        if self.shot_timer > 0:
            self.shot_timer -= 1
        # 10) oxygen / surfacing
        if self.sub_y > 0:
            self.oxygen -= 1
            self.surface = False
            if self.oxygen < 0:
                terminal = True
        elif not self.surface:
            if self.held == 0:
                terminal = True
            else:
                if self.held == 6:
                    r += float((self.oxygen * 10) // MAX_OXYGEN)
                    if self.ramping and (self.e_spawn_speed > 1
                                         or self.move_speed > 2):
                        if self.move_speed > 2 and self.ramp_index % 2:
                            self.move_speed -= 1
                        if self.e_spawn_speed > 1:
                            self.e_spawn_speed -= 1
                        self.ramp_index += 1
                    self.held = 0
                else:
                    self.held -= 1
                self.oxygen = MAX_OXYGEN
            self.surface = True
        return r, terminal

    def obs(self):
        o = np.zeros((10, 10, 10), np.uint8)
        o[self.sub_y, self.sub_x, 0] = 1
        bx = self.sub_x - 1 if self.sub_or else self.sub_x + 1
        if 0 <= bx <= 9:
            o[self.sub_y, bx, 1] = 1
        for b in self.fb:
            if b is not None:
                o[b[1], b[0], 2] = 1
        for e in (self.fish + self.esub):
            if e is not None:
                tx = e[0] - 1 if e[2] else e[0] + 1
                if 0 <= tx <= 9:
                    o[e[1], tx, 3] = 1
        for b in self.ebul:
            if b is not None:
                o[b[1], b[0], 4] = 1
        for f in self.fish:
            if f is not None:
                o[f[1], f[0], 5] = 1
        for s in self.esub:
            if s is not None:
                o[s[1], s[0], 6] = 1
        o[9, 0:(self.oxygen * 10) // MAX_OXYGEN, 7] = 1
        o[9, 9 - self.held:9, 8] = 1
        for d in self.div:
            if d is not None:
                o[d[1], d[0], 9] = 1
        return o


def _np_state(state):
    """One bulk D2H pull per step (per-field int() pulls dominate the
    test's runtime otherwise)."""
    return {k: np.asarray(v) for k, v in state._asdict().items()
            if k != "key"}


def _slot(st, pre, i, s, fields):
    return [int(st[f"{pre}_{f}"][i, s]) for f in fields]


def test_seaquest_matches_scalar_model():
    E, T = 8, 600
    env = DeviceSeaquest(sticky_prob=0.0, time_limit=10**9)
    step = jax.jit(env.step)
    state = env.reset(jax.random.key(7), E)
    scalars = [ScalarSeaquest() for _ in range(E)]
    rng = np.random.default_rng(17)
    kills = deaths = 0
    for t in range(T):
        actions = rng.integers(0, 6, size=(E,)).astype(np.int32)
        state, rew, term, trunc = step(state, jnp.asarray(actions))
        rew, term = np.asarray(rew), np.asarray(term)
        st = _np_state(state)
        es, elr, erow = st["dbg_e_spawned"], st["dbg_e_lr"], st["dbg_e_row"]
        esub = st["dbg_e_sub"]
        ds, dlr, drow = st["dbg_d_spawned"], st["dbg_d_lr"], st["dbg_d_row"]
        obs = np.asarray(env.observe(state))
        for i, sc in enumerate(scalars):
            e_spawn = ((bool(elr[i]), int(erow[i]), bool(esub[i]))
                       if es[i] else None)
            d_spawn = (bool(dlr[i]), int(drow[i])) if ds[i] else None
            r, done = sc.step(int(actions[i]), e_spawn, d_spawn)
            assert r == rew[i], (t, i)
            assert done == term[i], (t, i)
            kills += int(r)
            deaths += int(done)
            if done:
                sc.reset()
            assert sc.sub_x == int(st["sub_x"][i]), (t, i)
            assert sc.sub_y == int(st["sub_y"][i]), (t, i)
            assert sc.sub_or == bool(st["sub_or"][i]), (t, i)
            assert sc.shot_timer == int(st["shot_timer"][i]), (t, i)
            assert sc.oxygen == int(st["oxygen"][i]), (t, i)
            assert sc.held == int(st["diver_count"][i]), (t, i)
            assert sc.surface == bool(st["surface"][i]), (t, i)
            assert sc.e_spawn_speed == int(st["e_spawn_speed"][i]), (t, i)
            assert sc.e_spawn_timer == int(st["e_spawn_timer"][i]), (t, i)
            assert sc.d_spawn_timer == int(st["d_spawn_timer"][i]), (t, i)
            assert sc.move_speed == int(st["move_speed"][i]), (t, i)
            assert sc.ramp_index == int(st["ramp_index"][i]), (t, i)
            for s in range(N_FISH):
                alive = sc.fish[s] is not None
                assert alive == bool(st["fish_alive"][i, s]), (t, i, s)
                if alive:
                    x, y, lr, tm = sc.fish[s]
                    assert [x, y, int(lr), tm] == _slot(
                        st, "fish", i, s,
                        ["x", "y", "right", "t"]), (t, i, s)
            for s in range(N_ESUB):
                alive = sc.esub[s] is not None
                assert alive == bool(st["es_alive"][i, s]), (t, i, s)
                if alive:
                    x, y, lr, tm, sht = sc.esub[s]
                    assert [x, y, int(lr), tm, sht] == _slot(
                        st, "es", i, s,
                        ["x", "y", "right", "t", "shot_t"]), (t, i, s)
            for s in range(N_EBUL):
                alive = sc.ebul[s] is not None
                assert alive == bool(st["eb_alive"][i, s]), (t, i, s)
                if alive:
                    x, y, lr = sc.ebul[s]
                    assert [x, y, int(lr)] == _slot(
                        st, "eb", i, s, ["x", "y", "right"]), (t, i, s)
            for s in range(N_DIV):
                alive = sc.div[s] is not None
                assert alive == bool(st["div_alive"][i, s]), (t, i, s)
                if alive:
                    x, y, lr, tm = sc.div[s]
                    assert [x, y, int(lr), tm] == _slot(
                        st, "div", i, s,
                        ["x", "y", "right", "t"]), (t, i, s)
            np.testing.assert_array_equal(sc.obs(), obs[i], str((t, i)))
    # the run must actually exercise shooting and dying
    assert kills > 0 and deaths > 0


def test_seaquest_surfacing_mechanics():
    """Scripted: no-diver death / partial surfacing / 6-diver cash-in
    (+ difficulty ramp), which random play essentially never reaches."""
    env = DeviceSeaquest(sticky_prob=0.0, time_limit=10**9)
    state = env.reset(jax.random.key(0), 3)
    state = state._replace(
        sub_y=jnp.asarray(np.array([1, 1, 1], np.int32)),
        surface=jnp.zeros((3,), jnp.bool_),
        diver_count=jnp.asarray(np.array([0, 3, 6], np.int32)),
        oxygen=jnp.asarray(np.array([150, 150, 150], np.int32)))
    state, rew, term, trunc = env.step(
        state, jnp.asarray(np.array([2, 2, 2], np.int32)))  # up -> y=0
    rew, term = np.asarray(rew), np.asarray(term)
    assert bool(term[0]) and not term[1:].any()
    assert rew[0] == 0.0
    # partial surfacing: one diver spent, oxygen refilled, no reward
    assert rew[1] == 0.0
    assert int(state.diver_count[1]) == 2
    assert int(state.oxygen[1]) == MAX_OXYGEN
    assert bool(state.surface[1])
    # cash-in: bonus = oxygen*10//MAX, divers zeroed, difficulty ramps
    assert rew[2] == float((150 * 10) // MAX_OXYGEN)
    assert int(state.diver_count[2]) == 0
    assert int(state.oxygen[2]) == MAX_OXYGEN
    assert int(state.e_spawn_speed[2]) == INIT_SPAWN_SPEED - 1
    assert int(state.ramp_index[2]) == 1
    # lane 0 auto-reset
    assert int(state.diver_count[0]) == 0
    assert int(state.oxygen[0]) == MAX_OXYGEN


def test_seaquest_oxygen_death_and_pickup():
    env = DeviceSeaquest(sticky_prob=0.0, time_limit=10**9)
    state = env.reset(jax.random.key(1), 2)
    div_alive = np.zeros((2, N_DIV), np.bool_)
    div_alive[1, 0] = True
    state = state._replace(
        sub_y=jnp.asarray(np.array([2, 2], np.int32)),
        surface=jnp.zeros((2,), jnp.bool_),
        oxygen=jnp.asarray(np.array([0, 100], np.int32)),
        div_x=state.div_x.at[1, 0].set(5),
        div_y=state.div_y.at[1, 0].set(2),
        div_t=state.div_t.at[1, 0].set(3),
        div_alive=jnp.asarray(div_alive))
    state, rew, term, trunc = env.step(
        state, jnp.asarray(np.array([0, 0], np.int32)))
    term = np.asarray(term)
    assert bool(term[0])            # oxygen ran out
    assert not bool(term[1])
    assert int(state.diver_count[1]) == 1   # picked up in place
    assert not bool(state.div_alive[1, 0])


def test_seaquest_registry_handle():
    from rltime_tpu.config.config import build
    h = build({"type": "minatar_seaquest", "num_envs": 4})
    assert h.spec.obs_shape == (10, 10, 10)
    assert h.spec.num_actions == 6
    assert h.is_device


def test_seaquest_trainer_smoke(tmp_path):
    """Fused device pipeline end-to-end on the 10-channel obs."""
    config = {
        "seed": 0,
        "env": {"type": "minatar_seaquest", "num_envs": 8},
        "model": {"torso": "minatar_cnn", "cnn_channels": [8],
                  "cnn_fc": 32, "head": "dueling", "dueling_hidden": 8},
        "replay": {"steps_per_env": 256, "prioritized": True},
        "algo": {"algo": "dqn", "batch_size": 16, "n_step": 3,
                 "double_q": True, "lr": 1e-3},
        "exploration": {"type": "epsilon_greedy", "eps_start": 1.0,
                        "eps_end": 0.1, "anneal_steps": 1000},
        "train": {"total_env_steps": 1024, "warmup_env_steps": 384,
                  "chunk_len": 16, "updates_per_chunk": 1,
                  "log_interval": 10_000},
    }
    from rltime_tpu.training.trainer import Trainer
    tr = Trainer(config, str(tmp_path / "run"))
    m = {}
    for _ in range(6):
        m, _ = tr.train_chunk()
    assert np.isfinite(float(m["loss"]))
