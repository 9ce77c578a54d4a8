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
    # Chunks per dispatch: each iteration = 1 chunk insert + 4 updates
    # (same per-transition work as a chunked training loop, launched as
    # ONE XLA program — the shape a high-throughput deployment runs
    # with a prefetching loader, and the only honest way to measure the
    # device pipeline when the host link has multi-ms dispatch
    # latency). The chunk loop is a lax.scan with the replay state in
    # the carry: XLA keeps the ring update IN PLACE across iterations
    # (verified in HLO), so the one entry+exit relayout pair the ring's
    # committed layout costs (~4.5 ms on the 462 MB obs ring; XLA's
    # default layout for big u8 image arrays disagrees with the
    # row-major layout every internal op wants) amortizes over S
    # chunks instead of being paid per chunk. Compile time is O(1) in
    # S because it's a scan, not an unroll.
    S = 16

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
    update = make_update_step(mcfg, acfg, rcfg, F, False)

    from rltime_tpu.training.learner import make_insert_and_update_step
    insert_update = make_insert_and_update_step(rcfg, update, 4)

    def superstep(tstate, rstate, beta, chunks):
        """S x (insert one chunk + 4 updates) as one XLA program.

        lax.scan with (train_state, replay_state) in the carry. The
        ring insert (dynamic_update_slice) stays in place across
        iterations — the body's row-major layout pin makes every
        iteration agree, so the while loop carries one buffer and the
        only ring copies left are the entry/exit relayout pair, paid
        once per DISPATCH (S chunks), not once per chunk.
        """
        def body(carry, ck):
            ts, rs = carry
            ts, rs, m = insert_update(ts, rs, ck, beta)
            return (ts, rs), m

        (tstate, rstate), ms = jax.lax.scan(body, (tstate, rstate),
                                            chunks)
        metrics = jax.tree.map(lambda x: x[-1], ms)
        return tstate, rstate, metrics

    superstep = jax.jit(superstep, donate_argnums=(0, 1))

    def stacked(base):
        out = [chunk(base + i) for i in range(S)]
        return {k: jnp.asarray(np.stack([c[k] for c in out]))
                for k in out[0]}

    beta = jnp.float32(0.4)
    # compile + warmup. HARD host sync via D2H scalar pulls — on the
    # tunneled backend block_until_ready can return before the queue
    # drains, which inflates rates and leaves work in flight.
    warm = stacked(50)
    tstate, rstate, metrics = superstep(tstate, rstate, beta, warm)
    float(np.asarray(metrics["loss"]))

    dispatches = 6
    # Pregenerate + pre-transfer insert chunks so the timed region
    # measures the DEVICE pipeline (sample/gather/fwd/bwd/priorities +
    # inserts), not host-side numpy RNG.
    device_chunks = [stacked(100 + S * i) for i in range(dispatches)]
    float(np.asarray(device_chunks[-1]["reward"][0, 0, 0]))

    t0 = time.perf_counter()
    for i in range(dispatches):
        tstate, rstate, metrics = superstep(tstate, rstate, beta,
                                            device_chunks[i])
    float(np.asarray(metrics["loss"]))   # drains the whole chain
    dt = time.perf_counter() - t0

    iters = dispatches * S * 4           # learner updates executed
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
