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
                  "log_interval": 256, "track_best": True,
                  "best_min_episodes": 1},
    }
    t = ApexTrainer(cfg, str(tmp_path / "apex")).train()
    assert t.updates_done > 0
    # best-checkpoint tracking on the apex path (r5 parity with
    # Trainer/fused): a best was recorded and its checkpoint exists
    from rltime_tpu.training import checkpoint as ckpt_lib
    best = ckpt_lib.best_step(str(tmp_path / "apex"))
    assert best is not None and best["score"] > 0
    assert (tmp_path / "apex" / "checkpoints"
            / str(best["step"])).is_dir()
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


def test_fused_interleaved_superstep(tmp_path):
    """train.interleave_updates: {env step + 1-col insert + u/L
    updates} x L in one scan (VERDICT r4 Next #2). Different cadence
    by design (per-step param/priority freshness), so no bit-identity
    claim — the test pins counters, training progress, and that the
    per-step inserts respect the replay invariants on the 8-dev
    mesh."""
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
        "train": {"total_env_steps": 8000, "warmup_env_steps": 1024,
                  "chunk_len": 16, "updates_per_chunk": 32,
                  "log_interval": 10**9,
                  "supersteps_per_dispatch": 2,
                  "interleave_updates": True},
    }
    t = FusedApexTrainer(cfg, str(tmp_path / "il")).train()
    assert t.env_steps >= 8000
    # one 512-step warm chunk (L-shaped insert over the same ring the
    # L=1 interleaved inserts then write), then 2 updates per column
    per_chunk = 16 * 32   # chunk_len x global lanes
    assert t.updates_done == (t.env_steps - 512) // per_chunk * 32
    rets = t.episode_stats()
    assert rets and all(1 <= r <= 500 for r in rets)
    for leaf in jax.tree.leaves(t.train_state.params):
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)
    # per-shard trees alive after L=1 inserts
    tree = np.asarray(t.replay_state.tree).reshape(t.num_shards, -1)
    assert np.all(tree[:, 1] > 0)


def test_fused_interleave_long_chunk_with_warmup(tmp_path):
    """interleave's ring-safety exemption must survive warmup: with
    chunk_len=64 on a 128-step ring (illegal for L-shaped inserts),
    the warm program inserts column-by-column (code-review r5
    finding: a warm-cfg re-validation re-imposed the bound)."""
    from rltime_tpu.parallel.fused import FusedApexTrainer
    cfg = {
        "seed": 0,
        "env": {"type": "cartpole_device", "num_envs": 4},
        "model": {"torso": "mlp", "mlp_hidden": [16],
                  "head": "linear"},
        "replay": {"steps_per_env": 128, "prioritized": True},
        "algo": {"algo": "dqn", "batch_size": 8, "n_step": 2,
                 "lr": 1e-3, "target_update_freq": 10},
        "train": {"total_env_steps": 10**9,
                  "warmup_env_steps": 4096,
                  "chunk_len": 64, "updates_per_chunk": 64,
                  "log_interval": 10**9,
                  "interleave_updates": True},
    }
    t = FusedApexTrainer(cfg, str(tmp_path / "il64"))
    t.superstep()                      # warm act + per-column inserts
    assert t.updates_done == 0
    m = t.superstep()                  # crosses warmup, trains
    assert t.updates_done == 64
    assert np.isfinite(float(m["loss"]))


def test_fused_multi_superstep_bit_identical(tmp_path):
    """S supersteps scanned in ONE dispatch == S sequential dispatches
    (same seed, ANNEALING beta — each scanned superstep consumes its
    own beta): params, replay tree, cursors, stats."""
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
                     "per_beta_start": 0.4, "per_beta_end": 1.0},
            "exploration": {"type": "epsilon_greedy",
                            "eps_start": 1.0, "eps_end": 0.1,
                            "anneal_steps": 2000},
            "train": {"total_env_steps": 4096,
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


@pytest.mark.parametrize("algo", ["dqn", "iqn", "r2d2"])
def test_fused_matches_trainer_path(tmp_path, algo):
    """Fused one-dispatch superstep at d=1 == 2-dispatch
    Trainer+DeviceActor, BIT FOR BIT — across the warmup boundary,
    with annealing beta AND actor-side inserted priorities — for ALL
    THREE algorithms (dqn, iqn, r2d2; round-3 verdict Weak #3).

    The single irreducible difference is the sharded learner's
    sampling-key discipline (fold_in of the shard index, exactly as in
    test_one_shard_mesh_matches_local_exactly); the Trainer side
    emulates that fold and everything else must match exactly. The
    fold emulation is IDENTICAL for all algorithms because every
    update step carries key := split(key, 3)[0] (r2d2.update_step's
    3-way split exists for exactly this).
    """
    from rltime_tpu.parallel.fused import FusedApexTrainer
    from rltime_tpu.training.trainer import Trainer
    from rltime_tpu.training.learner import (
        make_insert_and_update_step,
    )

    cfg = {
        "seed": 3,
        "env": {"type": "cartpole_device", "num_envs": 4},
        "model": {"torso": "mlp", "mlp_hidden": [16],
                  "head": "linear"},
        "replay": {"steps_per_env": 128, "prioritized": True,
                   "use_inserted_priorities": True},
        "algo": {"algo": "dqn", "batch_size": 8, "n_step": 2,
                 "lr": 1e-3, "target_update_freq": 10,
                 "per_beta_start": 0.4, "per_beta_end": 1.0},
        "exploration": {"type": "epsilon_greedy", "eps_start": 1.0,
                        "eps_end": 0.1, "anneal_steps": 2000},
        "train": {"total_env_steps": 4096,
                  "warmup_env_steps": 128, "chunk_len": 16,
                  "updates_per_chunk": 2, "log_interval": 10**9},
    }
    if algo == "iqn":
        cfg["model"].update({"head": "iqn", "iqn_embed_dim": 16,
                             "num_tau": 8, "num_tau_prime": 8,
                             "num_tau_policy": 8})
        cfg["algo"].update({"algo": "iqn", "num_tau": 8,
                            "num_tau_prime": 8})
    elif algo == "r2d2":
        cfg["model"]["lstm_size"] = 8
        cfg["algo"].update({"algo": "r2d2", "n_step": 1,
                            "burn_in": 2, "seq_len": 4})
        # actor-side 1-step |TD| priorities are FF-only
        cfg["replay"]["use_inserted_priorities"] = False

    tr = Trainer(cfg, str(tmp_path / "trainer"))
    if algo == "r2d2":
        from rltime_tpu.training.r2d2 import make_r2d2_update_step
        upd = make_r2d2_update_step(tr.model_cfg, tr.algo_cfg,
                                    tr.replay_cfg, 1, tr.flatten)
    else:
        upd = make_update_step(tr.model_cfg, tr.algo_cfg,
                               tr.replay_cfg, 1, tr.flatten)

    def folded(ts, rs, beta):
        lt = ts.replace(key=jax.random.fold_in(ts.key, 0))
        nt, nr, m = upd(lt, rs, beta)
        return nt.replace(key=jax.random.split(ts.key, 3)[0]), nr, m

    tr._insert_update = jax.jit(
        make_insert_and_update_step(tr.replay_cfg, folded, 2),
        donate_argnums=(0, 1))

    fu = FusedApexTrainer(cfg, str(tmp_path / "fused"),
                          mesh=make_mesh(jax.devices()[:1]))

    for _ in range(5):
        tr.train_chunk()
        fu.superstep()

    def raw(x):
        if jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            return np.asarray(jax.random.key_data(x))
        return np.asarray(x)

    assert tr.actor.env_steps == fu.env_steps
    assert tr.updates_done == fu.updates_done > 0
    for a, b in zip(jax.tree.leaves(tr.train_state),
                    jax.tree.leaves(fu.train_state)):
        np.testing.assert_array_equal(raw(a), raw(b))
    np.testing.assert_array_equal(np.asarray(tr.replay_state.tree),
                                  np.asarray(fu.replay_state.tree))
    assert int(tr.replay_state.t) == int(fu.replay_state.t)
    assert (float(tr.replay_state.max_priority)
            == float(fu.replay_state.max_priority))
    # actor-side inserted priorities stored identically (FF algos)
    if "priority" in tr.replay_state.storage:
        np.testing.assert_array_equal(
            np.asarray(tr.replay_state.storage["priority"]),
            np.asarray(fu.replay_state.storage["priority"]))
    # episode bookkeeping identical
    np.testing.assert_array_equal(
        np.asarray(tr.actor.state.ret_ring),
        np.asarray(fu.actor_state.ret_ring))
    assert (int(tr.actor.state.ring_cursor)
            == int(fu.actor_state.ring_cursor[0]))


def test_fused_image_superstep(tmp_path):
    """Image-obs (MinAtar, uint8 ring) end-to-end through the fused
    superstep on the 8-device mesh — the flagship on-chip workload."""
    from rltime_tpu.parallel.fused import FusedApexTrainer
    cfg = {
        "seed": 0,
        "env": {"type": "minatar_breakout", "num_envs": 2,
                "sticky_prob": 0.1},
        "model": {"torso": "minatar_cnn", "cnn_channels": [4],
                  "cnn_fc": 16, "head": "dueling",
                  "dueling_hidden": 16},
        "replay": {"steps_per_env": 64, "prioritized": True},
        "algo": {"algo": "dqn", "batch_size": 4, "n_step": 3,
                 "lr": 1e-3, "target_update_freq": 10},
        "exploration": {"type": "epsilon_greedy", "eps_start": 1.0,
                        "eps_end": 0.1, "anneal_steps": 2000},
        "train": {"total_env_steps": 10**9, "warmup_env_steps": 256,
                  "chunk_len": 8, "updates_per_chunk": 2,
                  "log_interval": 10**9},
    }
    t = FusedApexTrainer(cfg, str(tmp_path / "img"))
    assert t.replay_state.storage["obs"].dtype == jnp.uint8
    assert t.replay_state.storage["obs"].shape == (16, 64, 10, 10, 4)
    # warmup: 256 steps at 8*2=16 lanes * 8 cols = 128/chunk
    m = t.superstep()
    assert m == {} and t.updates_done == 0          # warm dispatch
    m = t.superstep()
    assert t.updates_done == 2                      # crossed warmup
    assert np.isfinite(float(m["loss"]))
    # obs ring holds real binary planes, not all zeros
    assert int(np.asarray(t.replay_state.storage["obs"]).sum()) > 0


def test_fused_r2d2_superstep(tmp_path):
    """R2D2 sequence updates (stored LSTM state + burn-in) inside the
    fused one-dispatch superstep."""
    from rltime_tpu.parallel.fused import FusedApexTrainer
    cfg = {
        "seed": 1,
        "env": {"type": "cartpole_device", "num_envs": 2},
        "model": {"torso": "mlp", "mlp_hidden": [16],
                  "lstm_size": 8, "head": "linear"},
        "replay": {"steps_per_env": 64, "prioritized": True},
        "algo": {"algo": "r2d2", "batch_size": 4, "n_step": 1,
                 "burn_in": 2, "seq_len": 4, "lr": 1e-3,
                 "target_update_freq": 10},
        "exploration": {"type": "epsilon_greedy", "eps_start": 1.0,
                        "eps_end": 0.1, "anneal_steps": 2000},
        "train": {"total_env_steps": 10**9, "warmup_env_steps": 0,
                  "chunk_len": 8, "updates_per_chunk": 2,
                  "log_interval": 10**9},
    }
    t = FusedApexTrainer(cfg, str(tmp_path / "r2d2"))
    assert "rnn_c" in t.replay_state.storage
    for _ in range(3):
        m = t.superstep()
    assert t.updates_done == 6
    assert np.isfinite(float(m["loss"]))
    # stored carries made it into the ring
    assert float(np.abs(
        np.asarray(t.replay_state.storage["rnn_h"])).sum()) > 0


def test_fused_checkpoint_resume(tmp_path):
    """Deterministic resume of the fused path: 3 supersteps + save +
    restore + 3 more == 6 uninterrupted supersteps, bit for bit
    (learner, actor incl. PRNG/env state, replay contents)."""
    from rltime_tpu.parallel.fused import FusedApexTrainer

    def cfg(resume=False):
        return {
            "seed": 5,
            "env": {"type": "cartpole_device", "num_envs": 2},
            "model": {"torso": "mlp", "mlp_hidden": [16],
                      "head": "linear"},
            "replay": {"steps_per_env": 128, "prioritized": True},
            "algo": {"algo": "dqn", "batch_size": 8, "n_step": 2,
                     "lr": 1e-3, "target_update_freq": 10},
            "exploration": {"type": "epsilon_greedy",
                            "eps_start": 1.0, "eps_end": 0.1,
                            "anneal_steps": 2000},
            "train": {"total_env_steps": 4096,
                      "warmup_env_steps": 0, "chunk_len": 16,
                      "updates_per_chunk": 2, "log_interval": 10**9,
                      "checkpoint_replay": True, "resume": resume},
        }

    ref = FusedApexTrainer(cfg(), str(tmp_path / "ref"))
    for _ in range(6):
        ref.superstep()

    a = FusedApexTrainer(cfg(), str(tmp_path / "resumed"))
    for _ in range(3):
        a.superstep()
    a.save_checkpoint()
    del a
    b = FusedApexTrainer(cfg(resume=True), str(tmp_path / "resumed"))
    # restored counters: 3 supersteps * chunk_len 16 * (2 lanes * 8
    # shards) global lanes
    assert b.env_steps == 3 * 16 * 16
    for _ in range(3):
        b.superstep()

    def raw(x):
        if jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            return np.asarray(jax.random.key_data(x))
        return np.asarray(x)

    assert ref.env_steps == b.env_steps
    assert ref.updates_done == b.updates_done
    for x, y in zip(jax.tree.leaves(ref.train_state),
                    jax.tree.leaves(b.train_state)):
        np.testing.assert_array_equal(raw(x), raw(y))
    np.testing.assert_array_equal(np.asarray(ref.replay_state.tree),
                                  np.asarray(b.replay_state.tree))
    for k in ref.replay_state.storage:
        np.testing.assert_array_equal(
            np.asarray(ref.replay_state.storage[k]),
            np.asarray(b.replay_state.storage[k]))
    np.testing.assert_array_equal(np.asarray(ref.actor_state.ret_ring),
                                  np.asarray(b.actor_state.ret_ring))
