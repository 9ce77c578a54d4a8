"""MinAtar-style device-resident games: Asterix, Freeway, Space Invaders.

Companions to envs/minatar.py's DeviceBreakout (see that module's
docstring for the design rationale): miniaturized Atari games with the
published MinAtar dynamics (Young & Tian 2019, arXiv:1903.03176)
re-implemented as pure vectorized jnp so the full image-obs pipeline
trains with zero host involvement. The reference validates the same
capability on ALE Atari (SURVEY.md §0 items 1, 4); ALE is unavailable
in-sandbox, so these carry the image-env validation load.

Dynamics are the best reconstruction of the published games (the
MinAtar package is not installable here to diff against); every game
is cross-checked lane-by-lane against an INDEPENDENT scalar numpy
model in tests/test_minatar_games.py, so the vectorization itself is
golden-tested even where fidelity to upstream cannot be.

Shared conventions (same as DeviceBreakout):
  * obs: (10, 10, C) binary planes, uint8 NHWC; no frame stack —
    trail/direction channels carry one-step motion memory.
  * sticky actions (p=0.1) as in the MinAtar evaluation protocol.
  * lanes auto-reset on done; time-limit lanes report `truncated`
    EXCEPT Freeway, whose 2500-step limit is part of the published
    game and therefore reports `terminated` (MinAtar scores count it
    as an episode end, and the timer is unobservable there too).
  * minimal action sets (Asterix 5: n/l/u/r/d; Freeway 3: n/u/d;
    Space Invaders 4: n/l/r/f) — MinAtar exposes all 6 actions with
    the extras as no-ops; the minimal sets keep Q-heads small without
    changing the games.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def _const(E: int, v) -> jnp.ndarray:
    """Distinct numpy-backed per-lane int32 constant (see CLAUDE.md
    donation conventions: identical jnp constants may share one
    buffer, which breaks donation)."""
    return jnp.asarray(np.full((E,), v, np.int32))


# ---------------------------------------------------------------------------
# Asterix
# ---------------------------------------------------------------------------

class AsterixState(NamedTuple):
    px: jnp.ndarray          # (E,) player x
    py: jnp.ndarray          # (E,) player y (clamped to [1, 8])
    ent_x: jnp.ndarray       # (E, 8) entity x per slot (slot i -> row i+1)
    ent_lr: jnp.ndarray      # (E, 8) bool: True = moving right
    ent_gold: jnp.ndarray    # (E, 8) bool: treasure vs enemy
    ent_alive: jnp.ndarray   # (E, 8) bool
    spawn_speed: jnp.ndarray  # (E,) current spawn interval
    spawn_timer: jnp.ndarray
    move_speed: jnp.ndarray   # (E,) current entity move interval
    move_timer: jnp.ndarray
    ramp_timer: jnp.ndarray
    ramp_index: jnp.ndarray
    last_action: jnp.ndarray
    steps: jnp.ndarray
    key: jnp.ndarray
    # test hooks: the spawn decision taken THIS step (valid iff spawned)
    dbg_spawned: jnp.ndarray   # (E,) bool
    dbg_slot: jnp.ndarray      # (E,) int32
    dbg_lr: jnp.ndarray        # (E,) bool
    dbg_gold: jnp.ndarray      # (E,) bool


def _asterix_fresh(E: int, ramp_interval: int = 100) -> dict:
    return dict(
        px=_const(E, 5), py=_const(E, 5),
        ent_x=jnp.zeros((E, 8), jnp.int32),
        ent_lr=jnp.zeros((E, 8), jnp.bool_),
        ent_gold=jnp.zeros((E, 8), jnp.bool_),
        ent_alive=jnp.zeros((E, 8), jnp.bool_),
        spawn_speed=_const(E, 10), spawn_timer=_const(E, 10),
        move_speed=_const(E, 5), move_timer=_const(E, 5),
        ramp_timer=_const(E, ramp_interval), ramp_index=_const(E, 0),
        last_action=_const(E, 0), steps=_const(E, 0),
    )


class DeviceAsterix:
    """Vectorized MinAtar-style Asterix; all methods jit-safe.

    Actions: 0 no-op, 1 left, 2 up, 3 right, 4 down. Collect gold
    (+1), dodge enemies (terminal). Spawn/move intervals ramp down
    every 100 steps (`ramping=True`, the published default).
    Channels: player, enemy, trail, gold.
    """

    num_actions = 5
    obs_shape = (10, 10, 4)
    obs_dtype = jnp.uint8

    def __init__(self, sticky_prob: float = 0.1, time_limit: int = 2000,
                 ramping: bool = True, ramp_interval: int = 100):
        self.sticky_prob = sticky_prob
        self.time_limit = time_limit
        self.ramping = ramping
        self.ramp_interval = ramp_interval

    def reset(self, key, num_envs: int) -> AsterixState:
        E = num_envs
        return AsterixState(
            key=key, dbg_spawned=jnp.zeros((E,), jnp.bool_),
            dbg_slot=_const(E, 0), dbg_lr=jnp.zeros((E,), jnp.bool_),
            dbg_gold=jnp.zeros((E,), jnp.bool_),
            **_asterix_fresh(E, self.ramp_interval))

    def observe(self, state: AsterixState) -> jnp.ndarray:
        E = state.px.shape[0]
        lanes = jnp.arange(E)
        cols = jnp.arange(10)
        onehot = (state.ent_x[:, :, None] == cols[None, None, :])  # (E,8,10)
        alive = state.ent_alive[:, :, None]
        enemy = onehot & alive & ~state.ent_gold[:, :, None]
        gold = onehot & alive & state.ent_gold[:, :, None]
        back_x = jnp.where(state.ent_lr, state.ent_x - 1, state.ent_x + 1)
        tr_ok = alive & ((back_x >= 0) & (back_x <= 9))[:, :, None]
        trail = (back_x[:, :, None] == cols[None, None, :]) & tr_ok

        obs = jnp.zeros((E, 10, 10, 4), jnp.uint8)
        obs = obs.at[lanes, state.py, state.px, 0].set(1)
        # slot i lives on row i+1: place the (E, 8, 10) slot planes
        obs = obs.at[:, 1:9, :, 1].set(enemy.astype(jnp.uint8))
        obs = obs.at[:, 1:9, :, 2].set(trail.astype(jnp.uint8))
        obs = obs.at[:, 1:9, :, 3].set(gold.astype(jnp.uint8))
        return obs

    def step(self, state: AsterixState, actions: jnp.ndarray):
        E = actions.shape[0]
        key, k_sticky, k_lr, k_gold, k_slot = jax.random.split(state.key, 5)

        a = actions.astype(jnp.int32)
        if self.sticky_prob > 0:
            stick = jax.random.bernoulli(k_sticky, self.sticky_prob, (E,))
            a = jnp.where(stick, state.last_action, a)

        # 1) spawn if timer expired and a slot is free (uniform slot,
        #    side ~ U{L,R}, gold with p=1/3 — published parameters)
        free = ~state.ent_alive                              # (E, 8)
        any_free = jnp.any(free, axis=1)
        do_spawn = (state.spawn_timer == 0) & any_free
        u = jax.random.uniform(k_slot, (E, 8))
        slot = jnp.argmax(jnp.where(free, u, -1.0), axis=1).astype(jnp.int32)
        lr = jax.random.bernoulli(k_lr, 0.5, (E,))
        gold = jax.random.uniform(k_gold, (E,)) < (1.0 / 3.0)
        sx = jnp.where(lr, 0, 9).astype(jnp.int32)
        sl1 = jax.nn.one_hot(slot, 8, dtype=jnp.bool_) & do_spawn[:, None]
        ent_x = jnp.where(sl1, sx[:, None], state.ent_x)
        ent_lr = jnp.where(sl1, lr[:, None], state.ent_lr)
        ent_gold = jnp.where(sl1, gold[:, None], state.ent_gold)
        ent_alive = state.ent_alive | sl1
        spawn_timer = jnp.where(state.spawn_timer == 0,
                                state.spawn_speed, state.spawn_timer)

        # 2) player movement (y clamped to the entity band [1, 8])
        px = jnp.clip(state.px - (a == 1) + (a == 3), 0, 9)
        py = jnp.clip(state.py - (a == 2) + (a == 4), 1, 8)

        # 3) collision pass over slots (only slot py-1 can match)
        rows = jnp.arange(1, 9, dtype=jnp.int32)             # (8,)

        def collide(ent_x, ent_alive, ent_gold):
            hit = ent_alive & (ent_x == px[:, None]) \
                & (rows[None, :] == py[:, None])
            got_gold = hit & ent_gold
            died = jnp.any(hit & ~ent_gold, axis=1)
            r = jnp.sum(got_gold, axis=1).astype(jnp.float32)
            return ent_alive & ~got_gold, r, died

        ent_alive, r1, died1 = collide(ent_x, ent_alive, ent_gold)

        # 4) entity movement on move_timer expiry (+ second collision)
        do_move = state.move_timer == 0
        moved_x = ent_x + jnp.where(ent_lr, 1, -1)
        new_ent_x = jnp.where(do_move[:, None], moved_x, ent_x)
        oob = (new_ent_x < 0) | (new_ent_x > 9)
        ent_alive = ent_alive & ~(oob & do_move[:, None])
        ent_x = new_ent_x
        alive2, r2, died2 = collide(ent_x, ent_alive, ent_gold)
        ent_alive = jnp.where(do_move[:, None], alive2, ent_alive)
        r2 = jnp.where(do_move, r2, 0.0)
        died2 = died2 & do_move
        move_timer = jnp.where(do_move, state.move_speed, state.move_timer)

        reward = r1 + r2
        terminated = died1 | died2

        # 5) timer decrements (original decrements unconditionally,
        #    including the step the timer was just reset)
        spawn_timer = spawn_timer - 1
        move_timer = move_timer - 1

        # 6) difficulty ramp every RAMP_INTERVAL steps: spawn interval
        #    shrinks each ramp, move interval every other ramp
        spawn_speed, move_speed = state.spawn_speed, state.move_speed
        ramp_timer, ramp_index = state.ramp_timer, state.ramp_index
        if self.ramping:
            can_ramp = (spawn_speed > 1) | (move_speed > 1)
            tick = can_ramp & (ramp_timer >= 0)
            fire = can_ramp & (ramp_timer < 0)
            move_speed = jnp.where(
                fire & (move_speed > 1) & (ramp_index % 2 == 1),
                move_speed - 1, move_speed)
            spawn_speed = jnp.where(fire & (spawn_speed > 1),
                                    spawn_speed - 1, spawn_speed)
            ramp_index = ramp_index + fire.astype(jnp.int32)
            ramp_timer = jnp.where(fire, self.ramp_interval,
                                   ramp_timer - tick.astype(jnp.int32))

        steps = state.steps + 1
        truncated = (~terminated) & (steps >= self.time_limit)
        done = terminated | truncated

        fresh = _asterix_fresh(E, self.ramp_interval)
        cur = dict(px=px, py=py, ent_x=ent_x, ent_lr=ent_lr,
                   ent_gold=ent_gold, ent_alive=ent_alive,
                   spawn_speed=spawn_speed, spawn_timer=spawn_timer,
                   move_speed=move_speed, move_timer=move_timer,
                   ramp_timer=ramp_timer, ramp_index=ramp_index,
                   last_action=a, steps=steps)

        def pick(f, c):
            m = done.reshape((E,) + (1,) * (c.ndim - 1))
            return jnp.where(m, f, c)

        new_state = AsterixState(
            key=key, dbg_spawned=do_spawn,
            dbg_slot=slot, dbg_lr=lr, dbg_gold=gold,
            **{k: pick(fresh[k], cur[k]) for k in cur})
        return new_state, reward, terminated, truncated


# ---------------------------------------------------------------------------
# Freeway
# ---------------------------------------------------------------------------

class FreewayState(NamedTuple):
    pos: jnp.ndarray        # (E,) chicken row (column fixed at 4)
    move_timer: jnp.ndarray  # (E,) player move cooldown
    car_x: jnp.ndarray      # (E, 8) car x per row (row i+1)
    car_timer: jnp.ndarray  # (E, 8) countdown to next car move
    car_speed: jnp.ndarray  # (E, 8) signed: |.| = period, sign = dir
    last_action: jnp.ndarray
    steps: jnp.ndarray
    key: jnp.ndarray


def _freeway_cars(key, E: int):
    k1, k2 = jax.random.split(key)
    speed = jax.random.randint(k1, (E, 8), 1, 6)
    sign = jnp.where(jax.random.bernoulli(k2, 0.5, (E, 8)), 1, -1)
    speed = (speed * sign).astype(jnp.int32)
    return dict(car_x=jnp.zeros((E, 8), jnp.int32),
                car_timer=jnp.abs(speed), car_speed=speed)


class DeviceFreeway:
    """Vectorized MinAtar-style Freeway; all methods jit-safe.

    Actions: 0 no-op, 1 up, 2 down. +1 for crossing (cars then
    re-randomized, chicken back to start); a car hit knocks the
    chicken back to the start row. The fixed 2500-step episode end is
    part of the published game and reported as TERMINATED (the timer
    is unobservable in MinAtar too). No difficulty ramping exists.
    Channels: chicken, car, speed1..speed5 (trail cell encodes the
    car's period).
    """

    num_actions = 3
    obs_shape = (10, 10, 7)
    obs_dtype = jnp.uint8
    PLAYER_SPEED = 3

    def __init__(self, sticky_prob: float = 0.1, time_limit: int = 2500):
        self.sticky_prob = sticky_prob
        self.time_limit = time_limit

    def reset(self, key, num_envs: int) -> FreewayState:
        E = num_envs
        key, sub = jax.random.split(key)
        return FreewayState(
            pos=_const(E, 9), move_timer=_const(E, self.PLAYER_SPEED),
            last_action=_const(E, 0), steps=_const(E, 0), key=key,
            **_freeway_cars(sub, E))

    def observe(self, state: FreewayState) -> jnp.ndarray:
        E = state.pos.shape[0]
        lanes = jnp.arange(E)
        cols = jnp.arange(10)
        car = (state.car_x[:, :, None] == cols[None, None, :])  # (E,8,10)
        back_x = jnp.where(state.car_speed > 0,
                           state.car_x - 1, state.car_x + 1)
        back_x = jnp.mod(back_x, 10)          # wraps at both edges
        period = jnp.abs(state.car_speed)     # (E, 8) in [1, 5]
        # trail plane per period channel: (E, 8, 10, 5)
        trail = (back_x[:, :, None] == cols[None, None, :])[..., None] \
            & (period[:, :, None, None] == jnp.arange(1, 6))

        obs = jnp.zeros((E, 10, 10, 7), jnp.uint8)
        obs = obs.at[lanes, state.pos, 4, 0].set(1)
        obs = obs.at[:, 1:9, :, 1].set(car.astype(jnp.uint8))
        obs = obs.at[:, 1:9, :, 2:7].set(trail.astype(jnp.uint8))
        return obs

    def step(self, state: FreewayState, actions: jnp.ndarray):
        E = actions.shape[0]
        key, k_sticky, k_cars, k_reset = jax.random.split(state.key, 4)

        a = actions.astype(jnp.int32)
        if self.sticky_prob > 0:
            stick = jax.random.bernoulli(k_sticky, self.sticky_prob, (E,))
            a = jnp.where(stick, state.last_action, a)

        # player move on cooldown expiry
        can = (state.move_timer == 0) & (a != 0)
        pos = jnp.where(can & (a == 1), jnp.maximum(state.pos - 1, 0),
                        state.pos)
        pos = jnp.where(can & (a == 2), jnp.minimum(state.pos + 1, 9),
                        pos)
        move_timer = jnp.where(can, self.PLAYER_SPEED, state.move_timer)

        # crossing: +1, re-randomize cars, restart at the bottom
        scored = pos == 0
        reward = scored.astype(jnp.float32)
        rand = _freeway_cars(k_cars, E)
        car_x = jnp.where(scored[:, None], rand["car_x"], state.car_x)
        car_timer = jnp.where(scored[:, None], rand["car_timer"],
                              state.car_timer)
        car_speed = jnp.where(scored[:, None], rand["car_speed"],
                              state.car_speed)
        pos = jnp.where(scored, 9, pos)

        # car updates: hit check, then move-on-timer + second hit check.
        # Cars occupy distinct rows, so per-row checks are independent
        # (a hit sets pos=9, where no car row lives).
        rows = jnp.arange(1, 9, dtype=jnp.int32)
        hit1 = (car_x == 4) & (rows[None, :] == pos[:, None])
        pos = jnp.where(jnp.any(hit1, axis=1), 9, pos)
        do_move = car_timer == 0
        moved = car_x + jnp.where(car_speed > 0, 1, -1)
        moved = jnp.mod(moved, 10)            # wraps at both edges
        car_x = jnp.where(do_move, moved, car_x)
        car_timer = jnp.where(do_move, jnp.abs(car_speed), car_timer - 1)
        hit2 = do_move & (car_x == 4) & (rows[None, :] == pos[:, None])
        pos = jnp.where(jnp.any(hit2, axis=1), 9, pos)

        move_timer = jnp.maximum(move_timer - 1, 0)
        steps = state.steps + 1
        # the fixed episode length is the published game's own end
        terminated = steps >= self.time_limit
        truncated = jnp.zeros_like(terminated)

        fresh_cars = _freeway_cars(k_reset, E)
        m1 = terminated
        m2 = terminated[:, None]
        new_state = FreewayState(
            pos=jnp.where(m1, 9, pos),
            move_timer=jnp.where(m1, self.PLAYER_SPEED, move_timer),
            car_x=jnp.where(m2, fresh_cars["car_x"], car_x),
            car_timer=jnp.where(m2, fresh_cars["car_timer"], car_timer),
            car_speed=jnp.where(m2, fresh_cars["car_speed"], car_speed),
            last_action=jnp.where(m1, 0, a),
            steps=jnp.where(m1, 0, steps),
            key=key)
        return new_state, reward, terminated, truncated


# ---------------------------------------------------------------------------
# Space Invaders
# ---------------------------------------------------------------------------

class SpaceInvadersState(NamedTuple):
    pos: jnp.ndarray          # (E,) cannon x (row fixed at 9)
    f_bullets: jnp.ndarray    # (E, 10, 10) bool, move up
    e_bullets: jnp.ndarray    # (E, 10, 10) bool, move down
    aliens: jnp.ndarray       # (E, 10, 10) bool
    alien_dir: jnp.ndarray    # (E,) int32 in {-1, +1}
    enemy_move_interval: jnp.ndarray  # (E,) ramps down on wave clear
    alien_move_timer: jnp.ndarray
    alien_shot_timer: jnp.ndarray
    shot_timer: jnp.ndarray   # (E,) player fire cooldown
    last_action: jnp.ndarray
    steps: jnp.ndarray
    key: jnp.ndarray


def _si_wave(E: int) -> jnp.ndarray:
    """Fresh 4x6 alien block on rows 0-3, cols 2-7."""
    a = jnp.zeros((E, 10, 10), jnp.bool_)
    return a.at[:, 0:4, 2:8].set(True)


def _si_fresh(E: int) -> dict:
    return dict(
        pos=_const(E, 5),
        f_bullets=jnp.zeros((E, 10, 10), jnp.bool_),
        e_bullets=jnp.zeros((E, 10, 10), jnp.bool_),
        aliens=_si_wave(E),
        alien_dir=_const(E, -1),
        enemy_move_interval=_const(E, 12),
        alien_move_timer=_const(E, 12),
        alien_shot_timer=_const(E, 10),
        shot_timer=_const(E, 0),
        last_action=_const(E, 0),
        steps=_const(E, 0),
    )


class DeviceSpaceInvaders:
    """Vectorized MinAtar-style Space Invaders; all methods jit-safe.

    Actions: 0 no-op, 1 left, 2 right, 3 fire. Shoot the marching
    alien block (+1 per kill); terminal when an alien bullet or the
    block reaches the cannon. The block speeds up as it thins
    (move timer = min(#aliens, interval)) and each cleared wave
    ramps the interval down (`ramping=True`, published default).
    The game itself is DETERMINISTIC (the only randomness here is
    the sticky-action protocol). Channels: cannon, alien, alien_left,
    alien_right, friendly_bullet, enemy_bullet.
    """

    num_actions = 4
    obs_shape = (10, 10, 6)
    obs_dtype = jnp.uint8
    SHOT_COOL_DOWN = 5
    ENEMY_SHOT_INTERVAL = 10

    def __init__(self, sticky_prob: float = 0.1, time_limit: int = 2000,
                 ramping: bool = True):
        self.sticky_prob = sticky_prob
        self.time_limit = time_limit
        self.ramping = ramping

    def reset(self, key, num_envs: int) -> SpaceInvadersState:
        return SpaceInvadersState(key=key, **_si_fresh(num_envs))

    def observe(self, state: SpaceInvadersState) -> jnp.ndarray:
        E = state.pos.shape[0]
        lanes = jnp.arange(E)
        al = state.aliens.astype(jnp.uint8)
        left = (state.alien_dir < 0)[:, None, None]
        obs = jnp.zeros((E, 10, 10, 6), jnp.uint8)
        obs = obs.at[lanes, 9, state.pos, 0].set(1)
        obs = obs.at[:, :, :, 1].set(al)
        obs = obs.at[:, :, :, 2].set(al * left)
        obs = obs.at[:, :, :, 3].set(al * ~left)
        obs = obs.at[:, :, :, 4].set(state.f_bullets.astype(jnp.uint8))
        obs = obs.at[:, :, :, 5].set(state.e_bullets.astype(jnp.uint8))
        return obs

    def step(self, state: SpaceInvadersState, actions: jnp.ndarray):
        E = actions.shape[0]
        lanes = jnp.arange(E)
        key, k_sticky = jax.random.split(state.key)

        a = actions.astype(jnp.int32)
        if self.sticky_prob > 0:
            stick = jax.random.bernoulli(k_sticky, self.sticky_prob, (E,))
            a = jnp.where(stick, state.last_action, a)

        # player: fire (on cooldown) or move
        fire = (a == 3) & (state.shot_timer == 0)
        f_bullets = state.f_bullets.at[lanes, 9, state.pos].max(fire)
        shot_timer = jnp.where(fire, self.SHOT_COOL_DOWN,
                               state.shot_timer)
        pos = jnp.clip(state.pos - (a == 1) + (a == 2), 0, 9)

        # bullets march one row (friendly up, enemy down)
        f_bullets = jnp.roll(f_bullets, -1, axis=1).at[:, 9, :].set(False)
        e_bullets = jnp.roll(state.e_bullets, 1, axis=1) \
            .at[:, 0, :].set(False)
        shot_down = e_bullets[lanes, 9, pos]

        # alien block march on timer expiry
        aliens, alien_dir = state.aliens, state.alien_dir
        do_move = state.alien_move_timer == 0
        n_alive = jnp.sum(aliens, axis=(1, 2)).astype(jnp.int32)
        at_edge = ((jnp.any(aliens[:, :, 0], axis=1) & (alien_dir < 0))
                   | (jnp.any(aliens[:, :, 9], axis=1) & (alien_dir > 0)))
        drop = do_move & at_edge
        landed = drop & jnp.any(aliens[:, 9, :], axis=1)
        dropped = jnp.roll(aliens, 1, axis=1)
        shifted_l = jnp.roll(aliens, -1, axis=2)
        shifted_r = jnp.roll(aliens, 1, axis=2)
        shifted = jnp.where((alien_dir > 0)[:, None, None],
                            shifted_r, shifted_l)
        aliens = jnp.where(drop[:, None, None], dropped,
                           jnp.where(do_move[:, None, None], shifted,
                                     aliens))
        alien_dir = jnp.where(drop, -alien_dir, alien_dir)
        alien_move_timer = jnp.where(
            do_move,
            jnp.minimum(n_alive, state.enemy_move_interval),
            state.alien_move_timer)
        # checked only on move steps, as in the published game (the
        # cannon sliding under a parked bottom-row alien is not
        # terminal until the block next marches)
        overrun = do_move & aliens[lanes, 9, pos]

        # alien shot: lowest alien in the column nearest the cannon
        cols = jnp.arange(10, dtype=jnp.int32)
        col_has = jnp.any(aliens, axis=1)                    # (E, 10)
        near_key = 2 * jnp.abs(cols[None, :] - pos[:, None]) \
            + (cols[None, :] > pos[:, None])
        near_key = jnp.where(col_has, near_key, 99)
        shot_col = jnp.argmin(near_key, axis=1).astype(jnp.int32)
        col_cells = aliens[lanes, :, shot_col]               # (E, 10)
        shot_row = jnp.max(
            jnp.where(col_cells, jnp.arange(10, dtype=jnp.int32), -1),
            axis=1)
        do_shoot = (state.alien_shot_timer == 0) & jnp.any(col_has, axis=1)
        e_bullets = e_bullets.at[lanes, shot_row, shot_col].max(do_shoot)
        alien_shot_timer = jnp.where(
            state.alien_shot_timer == 0, self.ENEMY_SHOT_INTERVAL,
            state.alien_shot_timer)

        # friendly bullet <-> alien collisions
        kills = aliens & f_bullets
        reward = jnp.sum(kills, axis=(1, 2)).astype(jnp.float32)
        aliens = aliens & ~kills
        f_bullets = f_bullets & ~kills

        shot_timer = jnp.maximum(shot_timer - 1, 0)
        alien_move_timer = alien_move_timer - 1
        alien_shot_timer = alien_shot_timer - 1

        # wave cleared: refill (and ramp the march interval down)
        cleared = ~jnp.any(aliens, axis=(1, 2))
        enemy_move_interval = state.enemy_move_interval
        if self.ramping:
            enemy_move_interval = jnp.where(
                cleared & (enemy_move_interval > 6),
                enemy_move_interval - 1, enemy_move_interval)
        aliens = jnp.where(cleared[:, None, None], _si_wave(E), aliens)

        terminated = shot_down | landed | overrun
        steps = state.steps + 1
        truncated = (~terminated) & (steps >= self.time_limit)
        done = terminated | truncated

        fresh = _si_fresh(E)
        cur = dict(pos=pos, f_bullets=f_bullets, e_bullets=e_bullets,
                   aliens=aliens, alien_dir=alien_dir,
                   enemy_move_interval=enemy_move_interval,
                   alien_move_timer=alien_move_timer,
                   alien_shot_timer=alien_shot_timer,
                   shot_timer=shot_timer, last_action=a, steps=steps)

        def pick(f, c):
            m = done.reshape((E,) + (1,) * (c.ndim - 1))
            return jnp.where(m, f, c)

        new_state = SpaceInvadersState(
            key=key, **{k: pick(fresh[k], cur[k]) for k in cur})
        return new_state, reward, terminated, truncated
