"""Quantify the PER-sample obs gather plane (r4 profile: ~31% of the
bench program) across candidate replay storage layouts, on-chip.

Variants (B=1024 samples, bench ring shapes, each jitted as
gather -> model-ready bf16 NHWC tensors for obs_t and obs_tn):

  union:   current production path — u8 ring (E, T, 84, 84), one
           7-row union gather per sample, stack slices, transpose to
           NHWC, convert (history/replay.frame_stack_union_gather).
  stacked: candidate — u8 ring (E, T, 84, 84, F) storing each step's
           FULL frame stack NHWC; 2 contiguous rows per sample
           (cols t, t+n), no transpose. 4x obs HBM, ~14% more
           gathered bytes, contiguous 28 KB reads.

Prints ms/call for each (same process; includes convert+relayout so
the number is the whole memory plane the update pays before conv0).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")  # noqa: E402

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from rltime_tpu.history.replay import (
        ReplayConfig, replay_init, frame_stack_union_gather)

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      0.5)
    E, T, F, n, B = 64, 1024, 4, 3, 1024
    rng = np.random.default_rng(0)

    rcfg = ReplayConfig(num_envs=E, steps_per_env=T, horizon=n,
                        chunk_len=32, lookback=F - 1,
                        prioritized=True)
    fields = {"obs": ((84, 84), jnp.uint8),
              "done": ((), jnp.bool_)}
    rstate = replay_init(rcfg, fields)
    rstate.storage["obs"] = jnp.asarray(
        rng.integers(0, 255, (E, T, 84, 84), dtype=np.uint8))
    rstate.storage["done"] = jnp.asarray(rng.random((E, T)) < 0.02)

    env = jnp.asarray(rng.integers(0, E, B).astype(np.int32))
    col = jnp.asarray(rng.integers(F, T - n - 1, B).astype(np.int32))

    @jax.jit
    def union(rs, env, col):
        obs_t, obs_tn = frame_stack_union_gather(rcfg, rs, env, col,
                                                 F, n)
        # model-ready: bf16 NHWC
        f = lambda x: jnp.transpose(x, (0, 2, 3, 1)).astype(  # noqa
            jnp.bfloat16) / 255.0
        return f(obs_t), f(obs_tn)

    stacked_ring = jnp.asarray(
        rng.integers(0, 255, (E, T, 84, 84, F), dtype=np.uint8))

    @jax.jit
    def stacked(ring, env, col):
        rows_t = ring[env, col]                  # (B, 84, 84, F)
        rows_tn = ring[env, col + n]
        f = lambda x: x.astype(jnp.bfloat16) / 255.0  # noqa
        return f(rows_t), f(rows_tn)

    # pin-hypothesis variant: same union gather but with the ring in
    # the production row-major PINNED layout (history/replay pins it
    # for insert-in-place donation; the in-program gather is ~8x
    # slower than this tool's default-layout one — is the pin why?)
    from rltime_tpu.history.replay import _pin_rowmajor
    rstate_pinned = rstate.replace(
        storage=jax.jit(_pin_rowmajor)(rstate.storage))

    def timeit(fn, *args, reps=30):
        o = fn(*args)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(reps):
            o = fn(*args)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / reps * 1e3

    ms_u = timeit(union, rstate, env, col)
    ms_up = timeit(union, rstate_pinned, env, col)
    ms_s = timeit(stacked, stacked_ring, env, col)
    print(json.dumps({
        "union_ms_per_gather": round(ms_u, 3),
        "union_pinned_ms_per_gather": round(ms_up, 3),
        "stacked_ms_per_gather": round(ms_s, 3),
        "stacked_vs_union": round(ms_u / ms_s, 2),
        "pin_penalty": round(ms_up / ms_u, 2),
        "note": "B=1024, bench ring shapes; stacked trades 4x obs "
                "HBM (462MB -> 1.8GB at Atari scale); pinned = "
                "production row-major ring layout"}))


if __name__ == "__main__":
    main()
