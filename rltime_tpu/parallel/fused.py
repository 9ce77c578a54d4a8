"""Fused SPMD superstep: the whole Ape-X iteration as ONE XLA program.

For device-resident envs (envs/device.py), nothing in the train loop
needs the host at all — so the TPU-native end-state is a single
shard_map'd computation over the ('data','model') mesh in which every
device, per superstep:

  1. scans `chunk_len` env+policy steps over its OWN env lanes
     (per-shard PRNG streams; Ape-X eps ladder sliced per lane),
  2. inserts the chunk into its LOCAL replay shard (per-shard sum
     tree),
  3. runs K learner updates, `pmean`ing gradients over ICI — params
     stay replicated, target sync is free.

Host involvement per superstep: ONE dispatch + the logged scalars.
This composes the unchanged building blocks: envs/device.py dynamics,
history/replay.py insert/sample, training/learner.py update — under a
single shard_map; SURVEY.md §3.5's boundary diagram collapses to one
box.

Sharding layout (leading-axis 'data' everywhere, like parallel/mesh):
  env lanes (d*E_local, ...), stat rings (d*RING,), per-shard scalars
  shaped (d,) so each shard owns a (1,) slice; params/opt replicated.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rltime_tpu.history.replay import (
    ReplayConfig, ReplayState, replay_insert,
)
from rltime_tpu.models.policy import (
    ModelConfig, initial_rnn_state, make_model, q_values,
)
from rltime_tpu.parallel.mesh import replay_partition_specs
from rltime_tpu.training.learner import AlgoConfig, TrainState

STATS_RING = 256  # per shard


class FusedActorState(struct.PyTreeNode):
    env_state: Any            # leaves (E, ...) — sharded on axis 0
    done_prev: jnp.ndarray    # (E,)
    rnn: tuple
    key: jnp.ndarray          # (S,) key array — one stream per shard
    ep_ret: jnp.ndarray       # (E,)
    ep_len: jnp.ndarray       # (E,)
    ret_ring: jnp.ndarray     # (S*RING,)
    len_ring: jnp.ndarray     # (S*RING,)
    ring_cursor: jnp.ndarray  # (S,) int32


def _is_key(x):
    return jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key)


def init_fused_actor_state(env, cfg: ModelConfig, e_local: int,
                           num_shards: int, key,
                           mesh: Mesh) -> FusedActorState:
    d = num_shards
    E = d * e_local
    keys = jax.random.split(key, 2 * d)
    # Per-shard env states: array leaves concatenate on the lane axis,
    # PRNG-key leaves stack to (S,) so each shard owns its own stream.
    shards = [env.reset(keys[d + i], e_local) for i in range(d)]
    env_state = jax.tree.map(
        lambda *xs: (jnp.stack(xs) if _is_key(xs[0])
                     else jnp.concatenate(xs, axis=0)), *shards)
    state = FusedActorState(
        env_state=env_state,
        done_prev=jnp.ones((E,), bool),
        rnn=initial_rnn_state(cfg, E),
        key=keys[:d],
        ep_ret=jnp.array(np.zeros((E,), np.float32)),
        ep_len=jnp.array(np.zeros((E,), np.int32)),
        ret_ring=jnp.array(np.zeros((d * STATS_RING,), np.float32)),
        len_ring=jnp.array(np.zeros((d * STATS_RING,), np.float32)),
        ring_cursor=jnp.array(np.zeros((d,), np.int32)))
    return jax.device_put(state, NamedSharding(mesh, P("data")))


def fused_actor_specs(state: FusedActorState) -> FusedActorState:
    return jax.tree.map(lambda _: P("data"), state)


def make_superstep(env, model_cfg: ModelConfig, algo_cfg: AlgoConfig,
                   local_replay_cfg: ReplayConfig, mesh: Mesh,
                   chunk_len: int, num_updates: int,
                   example_rstate: ReplayState,
                   example_astate: FusedActorState,
                   supersteps: int = 1):
    """Build the jitted fused superstep over the mesh.

    `supersteps` > 1 scans S whole supersteps inside ONE dispatch
    (eps then shaped (S, L, E)). The replay ring rides the scan carry
    and XLA keeps its dynamic_update_slice IN PLACE across iterations,
    so the entry/exit relayout pair that XLA's default layout for big
    image rings costs (the committed layout of a (E, T, H, W) array
    disagrees with the row-major layout every internal op wants) is
    paid once per dispatch instead of once per superstep — and host
    dispatch latency amortizes S-fold. PRNG/eps/episode-stat flow is
    bit-identical to S sequential dispatches with the same beta.
    """
    from rltime_tpu.training.learner import make_update_step
    model = make_model(model_cfg)
    L = chunk_len
    local_update = make_update_step(
        model_cfg, algo_cfg, local_replay_cfg, frame_stack=1,
        flatten=True, axis_name="data")

    def act_body(params, carry, eps_t):
        astate = carry
        key = astate.key[0]
        key, ekey, akey, tkey = jax.random.split(key, 4)
        obs = env.observe(astate.env_state)
        rnn = astate.rnn
        if model_cfg.recurrent:
            m = (1.0 - astate.done_prev.astype(jnp.float32))[:, None]
            rnn = jax.tree.map(lambda s: s * m, rnn)
        stored_rnn = rnn
        taus = None
        if model_cfg.is_iqn:
            taus = jax.random.uniform(
                tkey, (obs.shape[0], model_cfg.num_tau_policy))
        q, rnn = model.apply(params, obs, rnn, taus)
        qv = q_values(model_cfg, q)
        E = obs.shape[0]
        greedy = jnp.argmax(qv, axis=-1).astype(jnp.int32)
        explore = jax.random.uniform(ekey, (E,)) < eps_t
        rand_a = jax.random.randint(akey, (E,), 0,
                                    model_cfg.num_actions, jnp.int32)
        actions = jnp.where(explore, rand_a, greedy)
        # unwrap the per-shard (1,)-shaped env key for the step
        es = jax.tree.map(
            lambda x: x[0] if _is_key(x) else x, astate.env_state)
        env_state, rew, term, trunc = env.step(es, actions)
        env_state = jax.tree.map(
            lambda x: x[None] if _is_key(x) else x, env_state)
        done = term | trunc
        ep_ret = astate.ep_ret + rew
        ep_len = astate.ep_len + 1
        offs = jnp.cumsum(done.astype(jnp.int32))
        cursor = astate.ring_cursor[0]
        idx = jnp.where(done, (cursor + offs - 1) % STATS_RING,
                        STATS_RING)
        ret_ring = astate.ret_ring.at[idx].set(ep_ret, mode="drop")
        len_ring = astate.len_ring.at[idx].set(
            ep_len.astype(jnp.float32), mode="drop")
        cursor = cursor + offs[-1]
        rec = dict(obs=obs, action=actions, reward=rew,
                   terminated=term, done=done)
        if model_cfg.recurrent:
            rec["rnn_c"] = stored_rnn[0]
            rec["rnn_h"] = stored_rnn[1]
        astate = FusedActorState(
            env_state=env_state, done_prev=done, rnn=rnn,
            key=key[None],
            ep_ret=jnp.where(done, 0.0, ep_ret),
            ep_len=jnp.where(done, 0, ep_len),
            ret_ring=ret_ring, len_ring=len_ring,
            ring_cursor=cursor[None])
        return astate, rec

    def _super(tstate, astate, rstate, eps, beta):
        # 1) act L steps over the local lanes
        astate, recs = jax.lax.scan(
            lambda c, e: act_body(tstate.params, c, e), astate, eps,
            length=L)
        chunk = {k: jnp.swapaxes(v, 0, 1) for k, v in recs.items()}
        # 2) local replay insert
        rstate = replay_insert(local_replay_cfg, rstate, chunk)
        rstate = rstate.replace(
            t=jax.lax.pmax(rstate.t, "data"),
            max_priority=jax.lax.pmax(rstate.max_priority, "data"))

        # 3) K learner updates with ICI pmean. Storage stays OUT of
        # the scan carry (read-only in updates; carrying it costs
        # full-ring boundary copies — see learner._scan_updates).
        storage = rstate.storage

        def upd_body(carry, _):
            t, tree, cur, max_p = carry
            r = rstate.replace(storage=storage, tree=tree, t=cur,
                               max_priority=max_p)
            shard = jax.lax.axis_index("data")
            lt = t.replace(key=jax.random.fold_in(t.key, shard))
            nt, nr, m = local_update(lt, r, beta)
            nt = nt.replace(key=jax.random.split(t.key, 3)[0])
            m = jax.tree.map(lambda x: jax.lax.pmean(x, "data"), m)
            max_p = jax.lax.pmax(nr.max_priority, "data")
            return (nt, nr.tree, nr.t, max_p), m
        carry0 = (tstate, rstate.tree, rstate.t, rstate.max_priority)
        (tstate, tree, cur, max_p), ms = jax.lax.scan(
            upd_body, carry0, None, length=num_updates)
        rstate = rstate.replace(tree=tree, t=cur, max_priority=max_p)
        metrics = jax.tree.map(lambda m: m[-1], ms)
        return tstate, astate, rstate, metrics

    def _multi(tstate, astate, rstate, eps, beta):
        """Scan S supersteps; eps (S, L, E_local) per shard."""
        def body(carry, eps_t):
            ts, a, r = carry
            ts, a, r, m = _super(ts, a, r, eps_t, beta)
            return (ts, a, r), m

        (tstate, astate, rstate), ms = jax.lax.scan(
            body, (tstate, astate, rstate), eps)
        metrics = jax.tree.map(lambda x: x[-1], ms)
        return tstate, astate, rstate, metrics

    rspecs = replay_partition_specs(example_rstate)
    aspecs = fused_actor_specs(example_astate)
    inner = _super if supersteps == 1 else _multi
    eps_spec = (P(None, "data") if supersteps == 1
                else P(None, None, "data"))

    def wrapped(tstate, astate, rstate, eps, beta):
        ts_specs = jax.tree.map(lambda _: P(), tstate)
        metric_specs = jax.tree.map(
            lambda _: P(), dict(loss=0, q=0, td_abs=0, grad_norm=0,
                                mean_weight=0))
        f = shard_map(inner, mesh=mesh,
                      in_specs=(ts_specs, aspecs, rspecs,
                                eps_spec, P()),
                      out_specs=(ts_specs, aspecs, rspecs,
                                 metric_specs),
                      check_vma=False)
        return f(tstate, astate, rstate, eps, beta)

    return jax.jit(wrapped, donate_argnums=(0, 1, 2))


class FusedApexTrainer:
    """Driver for the fused SPMD superstep (device envs only).

    One host dispatch per superstep covers acting + insert + K
    updates across the whole mesh. Config shape matches Trainer
    ("env": {"type": "<name>_device", "num_envs": PER-DEVICE lanes}).
    """

    def __init__(self, config, result_dir: str, mesh=None):
        from rltime_tpu.envs.device import make_device_env
        from rltime_tpu.parallel.mesh import (
            make_mesh, sharded_replay_init)
        from rltime_tpu.training.learner import make_train_state
        from rltime_tpu.training.trainer import (
            TrainLoopConfig, _mk_model_cfg)
        from rltime_tpu.config.config import build
        from rltime_tpu.utils.loggers import RunLogger
        from rltime_tpu.utils.prng import fold_in_str

        self.config = config
        seed = int(config.get("seed", 0))
        root = jax.random.key(seed)
        self.mesh = mesh if mesh is not None else make_mesh()
        d = self.mesh.shape["data"]
        self.num_shards = d

        env_name = config["env"]["type"].replace("_device", "")
        env_kwargs = {k: v for k, v in config["env"].items()
                      if k not in ("type", "num_envs", "seed")}
        self.env = make_device_env(env_name, **env_kwargs)
        e_local = int(config["env"]["num_envs"])
        self.e_global = e_local * d
        self.model_cfg = _mk_model_cfg(
            config.get("model", {}), self.env.num_actions)
        self.algo_cfg = AlgoConfig(**config.get("algo", {}))
        self.loop_cfg = TrainLoopConfig(**config.get("train", {}))
        self.replay_cfg = ReplayConfig(
            num_envs=e_local, horizon=self.algo_cfg.n_step,
            chunk_len=self.loop_cfg.chunk_len,
            **config.get("replay", {}))

        obs_dim = int(np.prod(self.env.obs_shape))
        fields = {
            "obs": (self.env.obs_shape, jnp.float32),
            "action": ((), jnp.int32),
            "reward": ((), jnp.float32),
            "terminated": ((), jnp.bool_),
            "done": ((), jnp.bool_),
        }
        if self.model_cfg.recurrent:
            H = self.model_cfg.lstm_size
            fields["rnn_c"] = ((H,), jnp.float32)
            fields["rnn_h"] = ((H,), jnp.float32)
        self.replay_state = sharded_replay_init(
            self.replay_cfg, d, fields, self.mesh)
        self.actor_state = init_fused_actor_state(
            self.env, self.model_cfg, e_local, d,
            fold_in_str(root, "actor"), self.mesh)
        self.train_state = jax.device_put(
            make_train_state(self.model_cfg, self.algo_cfg,
                             fold_in_str(root, "learner"),
                             jnp.zeros((1, obs_dim))),
            NamedSharding(self.mesh, P()))
        self.supersteps = max(
            1, int(self.loop_cfg.supersteps_per_dispatch))
        self._super = make_superstep(
            self.env, self.model_cfg, self.algo_cfg, self.replay_cfg,
            self.mesh, self.loop_cfg.chunk_len,
            self.loop_cfg.updates_per_chunk, self.replay_state,
            self.actor_state, supersteps=self.supersteps)
        self.exploration = build(config.get(
            "exploration", {"type": "epsilon_greedy"}))
        self.logger = RunLogger(result_dir, config)
        self.env_steps = 0
        self.updates_done = 0
        self._warm = False
        self._stats_popped = [0] * d

    def _beta(self):
        a = self.algo_cfg
        frac = min(self.env_steps
                   / max(self.loop_cfg.total_env_steps, 1), 1.0)
        return a.per_beta_start + frac * (a.per_beta_end
                                          - a.per_beta_start)

    def superstep(self):
        L, S = self.loop_cfg.chunk_len, self.supersteps
        eps = np.stack([
            self.exploration.epsilons(self.e_global,
                                      self.env_steps
                                      + t * self.e_global)
            for t in range(S * L)])
        if S > 1:
            eps = eps.reshape(S, L, self.e_global)
        self.train_state, self.actor_state, self.replay_state, m = \
            self._super(self.train_state, self.actor_state,
                        self.replay_state, jnp.asarray(eps),
                        jnp.float32(self._beta()))
        self.env_steps += S * L * self.e_global
        self.updates_done += S * self.loop_cfg.updates_per_chunk
        return m

    def episode_stats(self):
        """Recent completed returns pooled over all shards."""
        cursors = np.asarray(self.actor_state.ring_cursor)
        rings = np.asarray(self.actor_state.ret_ring).reshape(
            self.num_shards, STATS_RING)
        rets = []
        for s in range(self.num_shards):
            fresh = min(int(cursors[s]) - self._stats_popped[s],
                        STATS_RING)
            for i in range(fresh):
                rets.append(float(
                    rings[s][(int(cursors[s]) - 1 - i) % STATS_RING]))
            self._stats_popped[s] = int(cursors[s])
        return rets

    def train(self):
        import time as _time
        cfg = self.loop_cfg
        next_log = cfg.log_interval
        t_last, s_last = _time.time(), 0
        while self.env_steps < cfg.total_env_steps:
            m = self.superstep()
            if self.env_steps >= next_log:
                next_log = self.env_steps + cfg.log_interval
                rets = self.episode_stats()
                now = _time.time()
                scalars = dict(
                    env_steps=self.env_steps,
                    updates=self.updates_done,
                    steps_per_s=(self.env_steps - s_last)
                    / max(now - t_last, 1e-9))
                t_last, s_last = now, self.env_steps
                if rets:
                    scalars["episode_return_mean"] = float(
                        np.mean(rets))
                for k, v in m.items():
                    scalars[f"train/{k}"] = float(v)
                self.logger.log_scalars(self.env_steps, scalars)
                self.logger.summary(self.env_steps, scalars)
        self.logger.close()
        return self
