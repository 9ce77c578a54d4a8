"""Device-resident env + fused on-device acting loop tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rltime_tpu.envs.cartpole import CartPoleVecEnv
from rltime_tpu.envs.device import DeviceCartPole
from rltime_tpu.training.trainer import Trainer


def test_device_dynamics_match_numpy_engine_exactly():
    """Forced common state + same actions => identical next states
    (both implement gymnasium's Euler integration)."""
    rng = np.random.default_rng(0)
    E = 64
    s0 = rng.uniform(-0.05, 0.05, (E, 4))
    ref = CartPoleVecEnv(E, seed=0)
    ref._state = s0.copy()
    dev = DeviceCartPole()
    from rltime_tpu.envs.device import DeviceCartPoleState
    dstate = DeviceCartPoleState(
        s=jnp.array(s0, jnp.float32),
        steps=jnp.zeros((E,), jnp.int32),
        key=jax.random.key(0))
    for t in range(30):
        a = rng.integers(0, 2, E)
        ro, rr, rterm, rtrunc = ref.step(a)
        dstate, dr, dterm, dtrunc = dev.step(dstate, jnp.array(a))
        do = dev.observe(dstate)
        live = ~(rterm | rtrunc) & ~np.asarray(dterm | dtrunc)
        np.testing.assert_array_equal(np.asarray(dterm), rterm)
        # compare non-reset lanes (resets draw from different RNGs)
        np.testing.assert_allclose(np.asarray(do)[live], ro[live],
                                   rtol=2e-4, atol=2e-5)
        # keep states aligned: overwrite reset lanes in both
        both_done = rterm | rtrunc
        if both_done.any():
            fresh = rng.uniform(-0.05, 0.05, (both_done.sum(), 4))
            ref._state[both_done] = fresh
            s = np.array(dstate.s)  # writable copy
            s[both_done] = fresh
            dstate = dstate._replace(s=jnp.array(s, jnp.float32))


def _dev_cfg(**over):
    cfg = {
        "seed": 0,
        "env": {"type": "cartpole_device", "num_envs": 32},
        "frame_stack": 1,
        "model": {"torso": "mlp", "mlp_hidden": [32], "head": "linear"},
        "replay": {"steps_per_env": 256, "prioritized": True},
        "algo": {"algo": "dqn", "batch_size": 32, "n_step": 2,
                 "double_q": True, "lr": 1e-3,
                 "target_update_freq": 25},
        "exploration": {"type": "epsilon_greedy", "eps_start": 1.0,
                        "eps_end": 0.1, "anneal_steps": 2000},
        "train": {"total_env_steps": 4000, "warmup_env_steps": 600,
                  "chunk_len": 16, "updates_per_chunk": 1,
                  "log_interval": 10**9, "checkpoint_interval": 10**9},
    }
    cfg.update(over)
    return cfg


def test_device_actor_full_loop(tmp_path):
    t = Trainer(_dev_cfg(), str(tmp_path / "dev")).train()
    assert t.updates_done > 0
    rets, lens = t.actor.episode_stats()
    assert rets, "no completed episodes recorded on device"
    assert all(1 <= r <= 500 for r in rets)
    assert all(l >= 1 for l in lens)


def test_device_actor_stats_progression(tmp_path):
    """Ring stats: count grows, pops don't repeat."""
    t = Trainer(_dev_cfg(), str(tmp_path / "dev2"))
    t.train_chunk()
    t.train_chunk()
    r1, _ = t.actor.episode_stats()
    t.train_chunk()
    t.train_chunk()
    r2, _ = t.actor.episode_stats()
    assert len(r1) > 0 and len(r2) > 0
    # after clear, a fresh pop only returns NEW completions
    r3, _ = t.actor.episode_stats()
    assert r3 == []


def test_device_actor_deterministic(tmp_path):
    t1 = Trainer(_dev_cfg(), str(tmp_path / "a")).train()
    t2 = Trainer(_dev_cfg(), str(tmp_path / "b")).train()
    c1 = sum(float(jnp.sum(jnp.abs(l)))
             for l in jax.tree.leaves(t1.train_state.params))
    c2 = sum(float(jnp.sum(jnp.abs(l)))
             for l in jax.tree.leaves(t2.train_state.params))
    assert c1 == c2


@pytest.mark.slow
def test_device_cartpole_learns(tmp_path):
    """Device-resident CartPole reaches the same learning bar
    (greedy eval — training-tail episodes mix exploration churn)."""
    from rltime_tpu.config.config import load_config
    from rltime_tpu.eval import evaluate
    cfg = load_config("cartpole_dqn_device")
    cfg["train"]["log_interval"] = 20000
    d = str(tmp_path / "dl")
    Trainer(cfg, d).train()
    rep = evaluate(d, episodes=10, max_steps=100_000, best=True)
    assert rep["return_mean"] >= 475, rep


def test_device_actor_inserted_priorities():
    """DeviceActor's in-scan actor-side priorities == a host-side
    recomputation of |r + g*(1-done)*max_a Q(s') - Q(s,a)| from the
    emitted chunk (SURVEY.md §0 item 5 on the device path)."""
    from rltime_tpu.acting.device_actor import DeviceActor
    from rltime_tpu.envs.device import DeviceCartPole
    from rltime_tpu.models.policy import (
        ModelConfig, init_params, make_model,
    )

    class _Eps:
        def epsilons(self, n, step):
            return np.full((n,), 0.3, np.float32)

    E, L, gamma = 3, 6, 0.97
    env = DeviceCartPole()
    cfg = ModelConfig(num_actions=2, torso="mlp", mlp_hidden=(8,),
                      head="linear")
    params = init_params(cfg, jax.random.key(1), jnp.zeros((1, 4)))
    actor = DeviceActor(env, E, cfg, _Eps(), jax.random.key(2), L,
                        compute_priorities=True, gamma=gamma)
    chunk, _ = actor.rollout(params)
    assert chunk["priority"].shape == (E, L)

    model = make_model(cfg)
    obs = np.asarray(chunk["obs"])              # (E, L, 4)
    q = np.stack([np.asarray(model.apply(params, jnp.asarray(
        obs[:, t]), ())[0]) for t in range(L)], axis=1)  # (E, L, A)
    q_sa = np.take_along_axis(
        q, np.asarray(chunk["action"])[..., None], axis=-1)[..., 0]
    q_best = q.max(axis=-1)                     # (E, L)
    obs_last = np.asarray(env.observe(actor.state.env_state))
    q_last = np.asarray(model.apply(params, jnp.asarray(obs_last),
                                    ())[0]).max(axis=-1)
    q_next = np.concatenate([q_best[:, 1:], q_last[:, None]], axis=1)
    nondone = 1.0 - np.asarray(chunk["done"], np.float32)
    expect = np.abs(np.asarray(chunk["reward"])
                    + gamma * nondone * q_next - q_sa)
    np.testing.assert_allclose(np.asarray(chunk["priority"]), expect,
                               rtol=1e-5, atol=1e-6)
