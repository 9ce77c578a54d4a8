"""Benchmark: on-device learner pipeline throughput on one TPU chip.

Measures the steady-state jitted update cycle of the Atari
double/dueling n-step PER config (BASELINE.json config #2 shapes):
sum-tree sample -> frame-stack window gather -> Nature-CNN fwd/bwd ->
Adam -> priority write-back, batch per update, plus interleaved chunk
inserts at the matching replay ratio.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the BASELINE.json north star is >= 1M env-steps/s
aggregate on a v5e-16; the per-chip share is 62,500 steps/s. We report
learner transitions/s consumed on ONE chip against that per-chip bar
(the learner must keep up with acting for the pipeline to sustain it).
"""
import json
import time

import numpy as np


def main():
    import os
    import jax
    import jax.numpy as jnp

    # Persistent compile cache: first-run compiles through the remote
    # compile service are minutes; cached reruns are seconds.
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from rltime_tpu.history.replay import ReplayConfig, replay_init, replay_insert
    from rltime_tpu.models.policy import ModelConfig
    from rltime_tpu.training.learner import (
        AlgoConfig, make_train_state, make_update_step,
    )

    E, T, L, F, n_step = 64, 1024, 32, 4, 3
    batch = 256
    rcfg = ReplayConfig(num_envs=E, steps_per_env=T, horizon=n_step,
                        chunk_len=L, lookback=F - 1, prioritized=True)
    mcfg = ModelConfig(num_actions=6, torso="nature_cnn",
                       head="dueling", compute_dtype="bfloat16")
    acfg = AlgoConfig(algo="dqn", batch_size=batch, n_step=n_step,
                      double_q=True, lr=1e-4, target_update_freq=500)
    fields = {
        "obs": ((84, 84), jnp.uint8),
        "action": ((), jnp.int32),
        "reward": ((), jnp.float32),
        "terminated": ((), jnp.bool_),
        "done": ((), jnp.bool_),
    }
    rstate = replay_init(rcfg, fields)
    rng = np.random.default_rng(0)

    def chunk(k):
        return dict(
            obs=rng.integers(0, 255, size=(E, L, 84, 84),
                             dtype=np.uint8),
            action=rng.integers(0, 6, size=(E, L)).astype(np.int32),
            reward=rng.normal(size=(E, L)).astype(np.float32),
            terminated=(rng.random((E, L)) < 0.02),
            done=(rng.random((E, L)) < 0.02),
        )

    # warm the ring far enough for sampling
    for k in range(8):
        rstate = replay_insert(rcfg, rstate, chunk(k))

    ex_obs = jnp.zeros((1, F, 84, 84), jnp.uint8)
    tstate = make_train_state(mcfg, acfg, jax.random.key(0), ex_obs)
    update = jax.jit(make_update_step(mcfg, acfg, rcfg, F, False),
                     donate_argnums=(0, 1))

    beta = jnp.float32(0.4)
    # compile + warmup. HARD host sync via D2H scalar pulls — on the
    # tunneled backend block_until_ready can return before the queue
    # drains, which inflates rates and leaves work in flight.
    tstate, rstate, metrics = update(tstate, rstate, beta)
    float(np.asarray(metrics["loss"]))

    iters = 100
    # Pregenerate + pre-transfer insert chunks so the timed region
    # measures the DEVICE pipeline (sample/gather/fwd/bwd/priorities +
    # inserts), not host-side numpy RNG.
    n_inserts = iters // 4
    device_chunks = [
        {k: jnp.asarray(v) for k, v in chunk(100 + i).items()}
        for i in range(n_inserts)
    ]
    float(np.asarray(device_chunks[-1]["reward"][0, 0]))

    t0 = time.perf_counter()
    for i in range(iters):
        if i % 4 == 0:  # steady-state insert interleave
            rstate = replay_insert(rcfg, rstate,
                                   device_chunks[i // 4])
        tstate, rstate, metrics = update(tstate, rstate, beta)
    float(np.asarray(metrics["loss"]))   # drains the whole chain
    dt = time.perf_counter() - t0

    updates_per_s = iters / dt
    transitions_per_s = updates_per_s * batch
    per_chip_target = 1_000_000 / 16
    print(json.dumps({
        "metric": "learner_transitions_per_s_single_chip",
        "value": round(transitions_per_s, 1),
        "unit": "transitions/s",
        "vs_baseline": round(transitions_per_s / per_chip_target, 3),
    }))


if __name__ == "__main__":
    main()
