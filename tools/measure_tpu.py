"""Honest single-chip measurements with HARD host syncs.

Every timed region ends with a D2H scalar pull (np.asarray) — on the
tunneled axon backend, block_until_ready can return before the device
queue drains, silently inflating rates. Each section prints one line;
total runtime is kept under ~4 minutes with a warm compile cache.

Usage:  timeout 500 python tools/measure_tpu.py [section ...]
Sections: update devloop h2d act   (default: all)
"""
import os
import sys
import time

import numpy as np

# Runnable as `python tools/measure_tpu.py` from the repo root
# (PYTHONPATH overrides interfere with the sandbox's preloaded
# backend plugin, so fix sys.path here instead).
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def sync(x):
    return float(np.asarray(x).reshape(-1)[0])


def measure_update(jax, jnp):
    from rltime_tpu.history.replay import (
        ReplayConfig, replay_init, replay_insert)
    from rltime_tpu.models.policy import ModelConfig
    from rltime_tpu.training.learner import (
        AlgoConfig, make_train_state, make_update_step,
        make_multi_update_step)
    E, T, L, F, n = 64, 1024, 32, 4, 3
    fields = {"obs": ((84, 84), jnp.uint8),
              "action": ((), jnp.int32),
              "reward": ((), jnp.float32),
              "terminated": ((), jnp.bool_),
              "done": ((), jnp.bool_)}
    rng = np.random.default_rng(0)
    ck = dict(obs=rng.integers(0, 255, size=(E, L, 84, 84),
                               dtype=np.uint8),
              action=rng.integers(0, 6, size=(E, L)).astype(np.int32),
              reward=rng.normal(size=(E, L)).astype(np.float32),
              terminated=(rng.random((E, L)) < 0.02),
              done=(rng.random((E, L)) < 0.02))
    mcfg = ModelConfig(num_actions=6, torso="nature_cnn",
                       head="dueling", compute_dtype="bfloat16")
    for batch, K, iters in [(256, 1, 50), (256, 4, 25), (512, 4, 15)]:
        rcfg = ReplayConfig(num_envs=E, steps_per_env=T, horizon=n,
                            chunk_len=L, lookback=F - 1,
                            prioritized=True)
        rstate = replay_init(rcfg, fields)
        for k in range(8):
            rstate = replay_insert(rcfg, rstate, ck)
        acfg = AlgoConfig(algo="dqn", batch_size=batch, n_step=n,
                          double_q=True, lr=1e-4,
                          target_update_freq=500)
        ts = make_train_state(mcfg, acfg, jax.random.key(0),
                              jnp.zeros((1, F, 84, 84), jnp.uint8))
        upd = make_update_step(mcfg, acfg, rcfg, F, False)
        if K > 1:
            upd = make_multi_update_step(upd, K)
        upd = jax.jit(upd, donate_argnums=(0, 1))
        beta = jnp.float32(0.4)
        for _ in range(2):
            ts, rstate, m = upd(ts, rstate, beta)
        sync(m["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            ts, rstate, m = upd(ts, rstate, beta)
        sync(m["loss"])
        dt = time.perf_counter() - t0
        print(f"[update] batch={batch} K={K}: "
              f"{iters * K * batch / dt / 1e3:.0f}k trans/s "
              f"({dt / iters / K * 1e3:.3f} ms/upd)", flush=True)


def measure_devloop(jax, jnp):
    from rltime_tpu.training.trainer import Trainer
    for E in (4096, 16384):
        cfg = {
            "seed": 0,
            "env": {"type": "cartpole_device", "num_envs": E},
            "frame_stack": 1,
            "model": {"torso": "mlp", "mlp_hidden": [128, 128],
                      "head": "linear"},
            "replay": {"steps_per_env": 512, "prioritized": True},
            "algo": {"algo": "dqn", "batch_size": 512, "n_step": 3,
                     "double_q": True, "lr": 5e-4,
                     "target_update_freq": 500},
            "exploration": {"type": "epsilon_greedy"},
            "train": {"total_env_steps": 10 ** 12,
                      "warmup_env_steps": E * 64, "chunk_len": 64,
                      "updates_per_chunk": 4,
                      "log_interval": 10 ** 12,
                      "checkpoint_interval": 10 ** 12}}
        t = Trainer(cfg, f"/tmp/devloop_{E}")
        for _ in range(3):
            t.train_chunk()
        sync(t.train_state.updates)
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            m, _ = t.train_chunk()
        sync(m["loss"])
        dt = time.perf_counter() - t0
        print(f"[devloop] E={E}: {n * E * 64 / dt / 1e6:.2f} M "
              f"env-steps/s (full on-device train loop)", flush=True)


def measure_h2d(jax, jnp):
    for name, arr in [("451KB", np.ones((64, 84, 84), np.uint8)),
                      ("14.5MB", np.ones((64, 32, 84, 84), np.uint8))]:
        x = jax.device_put(arr)
        sync(x)
        t0 = time.perf_counter()
        iters = 20 if arr.nbytes < 10 ** 6 else 5
        for _ in range(iters):
            x = jax.device_put(arr)
        sync(x)
        dt = (time.perf_counter() - t0) / iters
        print(f"[h2d] {name}: {dt * 1e3:.1f} ms "
              f"({arr.nbytes / dt / 1e6:.0f} MB/s)", flush=True)


def measure_act(jax, jnp):
    from rltime_tpu.models.policy import ModelConfig, init_params
    from rltime_tpu.acting.actor import make_act_step, init_actor_state
    E, L = 64, 32
    cfg = ModelConfig(num_actions=6, torso="nature_cnn",
                      head="dueling", compute_dtype="bfloat16")
    step = make_act_step(cfg, 4, False)
    params = init_params(cfg, jax.random.key(0),
                         jnp.zeros((E, 4, 84, 84), jnp.uint8))
    state = init_actor_state(cfg, E, 4, (84, 84), jnp.uint8,
                             jax.random.key(1), chunk_len=L)
    obs = np.random.randint(0, 255, (E, 84, 84), np.uint8)
    done = np.zeros((E,), bool)
    eps = jnp.full((E,), 0.1)
    a, state, info, rnn, qsa, qb = step(params, state, obs, done, eps,
                                        jnp.int32(0))
    _ = np.asarray(a)
    N = 50
    t0 = time.perf_counter()
    for i in range(N):
        a, state, info, rnn, qsa, qb = step(params, state, obs, done,
                                            eps, jnp.int32(i % L))
        _ = np.asarray(a)  # the real loop's D2H sync
    dt = (time.perf_counter() - t0) / N
    print(f"[act] host-driven act step (E=64, uint8 84x84): "
          f"{dt * 1e3:.2f} ms/step -> {E / dt / 1e3:.1f}k env-steps/s",
          flush=True)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    sections = sys.argv[1:] or ["update", "devloop", "h2d", "act"]
    fns = dict(update=measure_update, devloop=measure_devloop,
               h2d=measure_h2d, act=measure_act)
    print(f"backend: {jax.default_backend()} {jax.devices()}",
          flush=True)
    for s in sections:
        fns[s](jax, jnp)


if __name__ == "__main__":
    main()
