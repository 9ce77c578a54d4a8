"""Mesh-plane tests on the virtual 8-device CPU mesh (SURVEY.md §4
item 4): real shard_map code paths — sharded replay insert, per-shard
PER sampling, psum'd gradients, replication invariants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rltime_tpu.history.replay import ReplayConfig, replay_init, replay_insert
from rltime_tpu.models.policy import ModelConfig
from rltime_tpu.parallel.mesh import (
    make_mesh, make_sharded_insert, make_sharded_update_step,
    shard_chunk, sharded_replay_init,
)
from rltime_tpu.training.learner import (
    AlgoConfig, make_train_state, make_update_step,
)

E_LOCAL, T, L, N_STEP = 2, 64, 8, 3

FIELDS = {
    "obs": ((4,), jnp.float32),
    "action": ((), jnp.int32),
    "reward": ((), jnp.float32),
    "terminated": ((), jnp.bool_),
    "done": ((), jnp.bool_),
}


def _local_cfg(prioritized=True):
    return ReplayConfig(num_envs=E_LOCAL, steps_per_env=T,
                        horizon=N_STEP, chunk_len=L,
                        prioritized=prioritized)


def _chunk(E, start, seed=0):
    rng = np.random.default_rng(seed + start)
    return dict(
        obs=rng.normal(size=(E, L, 4)).astype(np.float32),
        action=rng.integers(0, 3, size=(E, L)).astype(np.int32),
        reward=rng.normal(size=(E, L)).astype(np.float32),
        terminated=(rng.random((E, L)) < 0.1),
        done=(rng.random((E, L)) < 0.1),
    )


def _model_algo():
    mcfg = ModelConfig(num_actions=3, torso="mlp", mlp_hidden=(16,),
                       head="linear")
    acfg = AlgoConfig(algo="dqn", batch_size=8, n_step=N_STEP,
                      lr=1e-3, target_update_freq=5)
    return mcfg, acfg


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    assert mesh.shape["model"] == 1


def test_sharded_insert_places_local_lanes():
    mesh = make_mesh()
    d = mesh.shape["data"]
    cfg = _local_cfg()
    rstate = sharded_replay_init(cfg, d, FIELDS, mesh)
    assert rstate.storage["obs"].shape == (d * E_LOCAL, T, 4)
    from rltime_tpu.history.replay import _tree_ops
    per_shard = _tree_ops(cfg).init(cfg.capacity).shape[0]
    assert rstate.tree.shape == (d * per_shard,)

    insert = make_sharded_insert(cfg, mesh, rstate)
    chunk = shard_chunk(_chunk(d * E_LOCAL, 0), mesh)
    rstate = insert(rstate, chunk)
    assert int(rstate.t) == L
    # every shard's local tree got activity (distinct per-lane data)
    tree = np.asarray(rstate.tree).reshape(d, per_shard)
    totals = tree.sum(axis=1)  # dense: flat priorities; per-shard mass
    assert np.all(totals > 0)


def test_sharded_update_replication_and_progress():
    mesh = make_mesh()
    d = mesh.shape["data"]
    cfg = _local_cfg()
    mcfg, acfg = _model_algo()
    rstate = sharded_replay_init(cfg, d, FIELDS, mesh)
    insert = make_sharded_insert(cfg, mesh, rstate)
    for k in range(4):
        rstate = insert(rstate, shard_chunk(_chunk(d * E_LOCAL, k * L),
                                            mesh))
    tstate = make_train_state(mcfg, acfg, jax.random.key(0),
                              jnp.zeros((1, 4)))
    update = make_sharded_update_step(mcfg, acfg, cfg, 1, True, mesh,
                                      rstate)
    p0 = jax.tree.leaves(tstate.params)[0].copy()
    for _ in range(3):
        tstate, rstate, metrics = update(tstate, rstate,
                                         jnp.float32(0.4))
    assert int(tstate.updates) == 3
    assert np.isfinite(float(metrics["loss"]))
    # weights changed
    p1 = jax.tree.leaves(tstate.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # replication invariant: all devices hold identical params
    for leaf in jax.tree.leaves(tstate.params):
        shards = [np.asarray(s.data) for s in
                  leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)


def test_one_shard_mesh_matches_local_exactly():
    """d=1 shard_map == plain local update, bit for bit."""
    mesh = make_mesh(jax.devices()[:1])
    cfg = _local_cfg()
    mcfg, acfg = _model_algo()

    # local reference
    r_local = replay_init(cfg, FIELDS)
    for k in range(4):
        r_local = replay_insert(cfg, r_local, _chunk(E_LOCAL, k * L))
    t_local = make_train_state(mcfg, acfg, jax.random.key(0),
                               jnp.zeros((1, 4)))
    local_upd = jax.jit(make_update_step(mcfg, acfg, cfg, 1, True))

    # sharded copy
    r_sh = sharded_replay_init(cfg, 1, FIELDS, mesh)
    insert = make_sharded_insert(cfg, mesh, r_sh)
    for k in range(4):
        r_sh = insert(r_sh, shard_chunk(_chunk(E_LOCAL, k * L), mesh))
    t_sh = make_train_state(mcfg, acfg, jax.random.key(0),
                            jnp.zeros((1, 4)))
    sh_upd = make_sharded_update_step(mcfg, acfg, cfg, 1, True, mesh,
                                      r_sh)

    np.testing.assert_array_equal(np.asarray(r_local.tree),
                                  np.asarray(r_sh.tree))
    # SURVEY.md §4 item 4 bit-identity: the sharded path folds the
    # shard index into each step's sampling key; emulating that fold on
    # the local side makes the two runs draw IDENTICAL samples, so the
    # weights must match bit for bit.
    def local_folded(tstate, rstate, beta):
        lt = tstate.replace(key=jax.random.fold_in(tstate.key, 0))
        nt, nr, m = local_upd(lt, rstate, beta)
        return nt.replace(key=jax.random.split(tstate.key, 3)[0]), nr, m

    for _ in range(3):
        t_local, r_local, m_local = local_folded(t_local, r_local,
                                                 jnp.float32(0.4))
        t_sh, r_sh, m_sh = sh_upd(t_sh, r_sh, jnp.float32(0.4))
    assert int(t_local.updates) == int(t_sh.updates) == 3
    assert float(m_local["loss"]) == float(m_sh["loss"])
    for a, b in zip(jax.tree.leaves(t_local.params),
                    jax.tree.leaves(t_sh.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(r_local.tree),
                                  np.asarray(r_sh.tree))


def test_uniform_sharded_update():
    mesh = make_mesh()
    d = mesh.shape["data"]
    cfg = _local_cfg(prioritized=False)
    mcfg, acfg = _model_algo()
    rstate = sharded_replay_init(cfg, d, FIELDS, mesh)
    insert = make_sharded_insert(cfg, mesh, rstate)
    for k in range(3):
        rstate = insert(rstate, shard_chunk(_chunk(d * E_LOCAL, k * L),
                                            mesh))
    tstate = make_train_state(mcfg, acfg, jax.random.key(0),
                              jnp.zeros((1, 4)))
    update = make_sharded_update_step(mcfg, acfg, cfg, 1, True, mesh,
                                      rstate)
    tstate, rstate, metrics = update(tstate, rstate, jnp.float32(0.4))
    assert np.isfinite(float(metrics["loss"]))


def test_apex_trainer_end_to_end(tmp_path):
    """Full Ape-X loop on the 8-device mesh: per-device env lanes,
    ladder exploration, sharded insert, shard_map updates."""
    from rltime_tpu.parallel.apex import ApexTrainer
    cfg = {
        "seed": 0,
        "env": {"type": "counting_env", "num_envs": 2,
                "episode_len": 7},
        "frame_stack": 1,
        "model": {"torso": "mlp", "mlp_hidden": [16], "head": "linear"},
        "replay": {"steps_per_env": 128, "prioritized": True},
        "algo": {"algo": "dqn", "batch_size": 4, "n_step": 2,
                 "lr": 1e-3, "target_update_freq": 10},
        "exploration": {"type": "epsilon_greedy", "mode": "ladder"},
        "train": {"total_env_steps": 800, "warmup_env_steps": 200,
                  "chunk_len": 8, "updates_per_chunk": 1,
                  "log_interval": 10_000},
    }
    t = ApexTrainer(cfg, str(tmp_path / "apex")).train()
    assert t.updates_done > 0
    # ladder: 16 global lanes, per-lane eps strictly decreasing
    eps = t.actor.exploration.epsilons(16, 0)
    assert np.all(np.diff(eps) < 0)
    # replication invariant after training
    for leaf in jax.tree.leaves(t.train_state.params):
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)


def test_fused_superstep_end_to_end(tmp_path):
    """The whole Ape-X iteration (device envs -> sharded replay -> DP
    updates) as ONE shard_map'd program on the 8-device mesh."""
    from rltime_tpu.parallel.fused import FusedApexTrainer
    cfg = {
        "seed": 0,
        "env": {"type": "cartpole_device", "num_envs": 4},
        "model": {"torso": "mlp", "mlp_hidden": [16],
                  "head": "linear"},
        "replay": {"steps_per_env": 128, "prioritized": True},
        "algo": {"algo": "dqn", "batch_size": 8, "n_step": 2,
                 "lr": 1e-3, "target_update_freq": 10},
        "exploration": {"type": "epsilon_greedy", "eps_start": 1.0,
                        "eps_end": 0.1, "anneal_steps": 2000},
        "train": {"total_env_steps": 8000, "warmup_env_steps": 0,
                  "chunk_len": 16, "updates_per_chunk": 2,
                  "log_interval": 10**9},
    }
    t = FusedApexTrainer(cfg, str(tmp_path / "fused")).train()
    assert t.updates_done > 0
    assert t.env_steps >= 8000
    rets = t.episode_stats()
    assert rets and all(1 <= r <= 500 for r in rets)
    # replication invariant on params
    for leaf in jax.tree.leaves(t.train_state.params):
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)
    # per-shard sum trees all active
    d = t.num_shards
    tree = np.asarray(t.replay_state.tree).reshape(d, -1)
    assert np.all(tree[:, 1] > 0)


def test_fused_multi_superstep_bit_identical(tmp_path):
    """S supersteps scanned in ONE dispatch == S sequential dispatches
    (same seed, constant beta): params, replay tree, cursors, stats."""
    from rltime_tpu.parallel.fused import FusedApexTrainer

    def cfg(s):
        return {
            "seed": 7,
            "env": {"type": "cartpole_device", "num_envs": 2},
            "model": {"torso": "mlp", "mlp_hidden": [16],
                      "head": "linear"},
            "replay": {"steps_per_env": 128, "prioritized": True},
            "algo": {"algo": "dqn", "batch_size": 8, "n_step": 2,
                     "lr": 1e-3, "target_update_freq": 10,
                     # beta must not depend on env_steps for exact
                     # equality (the fused dispatch holds beta fixed
                     # across its S supersteps)
                     "per_beta_start": 0.5, "per_beta_end": 0.5},
            "exploration": {"type": "epsilon_greedy",
                            "eps_start": 1.0, "eps_end": 0.1,
                            "anneal_steps": 2000},
            "train": {"total_env_steps": 10**9,
                      "warmup_env_steps": 0, "chunk_len": 16,
                      "updates_per_chunk": 2,
                      "log_interval": 10**9,
                      "supersteps_per_dispatch": s},
        }

    t1 = FusedApexTrainer(cfg(1), str(tmp_path / "s1"))
    t3 = FusedApexTrainer(cfg(3), str(tmp_path / "s3"))
    for _ in range(3):
        t1.superstep()
    t3.superstep()
    assert t1.env_steps == t3.env_steps
    assert t1.updates_done == t3.updates_done
    for a, b in zip(jax.tree.leaves(t1.train_state.params),
                    jax.tree.leaves(t3.train_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(t1.replay_state.tree),
                                  np.asarray(t3.replay_state.tree))
    assert int(t1.replay_state.t) == int(t3.replay_state.t)
    np.testing.assert_array_equal(
        np.asarray(t1.actor_state.ring_cursor),
        np.asarray(t3.actor_state.ring_cursor))
    np.testing.assert_array_equal(
        np.asarray(t1.actor_state.ret_ring),
        np.asarray(t3.actor_state.ret_ring))
