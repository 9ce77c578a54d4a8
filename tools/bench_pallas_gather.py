"""A/B the fused Pallas union gather vs XLA's native gathers on chip.

Measures, at bench.py's learner shapes (E=64, T=1024, 84x84 u8 obs,
B=256, F=4, n=3), the per-update observation gather:

  A (XLA, the current learner path): two frame-stack window gathers
    (obs at col and col+n) = 8 rows/sample off the raw (E,T,84,84)
    ring;
  B (Pallas, ops/pallas_gather.fused_union_gather): ONE union window
    [col-F+1, col+n] = 7 rows/sample off a 128-lane row-padded ring,
    `group` DMAs in flight, + split_union stack extraction;
  C (Pallas, round-2 single-window kernel, for continuity with the
    0.53 ms vs 0.43 ms status-block numbers).

K gathers are scanned inside ONE jit dispatch (CLAUDE.md: never bench
per-dispatch loops on the tunneled chip) and each variant reduces its
output to a checksum so the consumer cost is identical. Run in ONE
process so the A/B shares chip tenancy:

  timeout 550 python tools/bench_pallas_gather.py [group ...]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

E, T, F, N_STEP, B, K = 64, 1024, 4, 3, 256, 64
OBS = (84, 84)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from rltime_tpu.ops.pallas_gather import (
        fused_union_gather, pad_rows, split_union, window_gather,
        window_gather_reference,
    )

    groups = [int(a) for a in sys.argv[1:]] or [8, 16]
    W = F + N_STEP
    rng = np.random.default_rng(0)
    storage = jnp.asarray(rng.integers(0, 255, (E, T) + OBS,
                                       dtype=np.uint8))
    padded = jax.jit(pad_rows)(storage)
    envs = jnp.asarray(rng.integers(0, E, (K, B)).astype(np.int32))
    cols = jnp.asarray(rng.integers(0, T, (K, B)).astype(np.int32))

    def checksum(x):
        return jnp.sum(x, dtype=jnp.int32)

    @jax.jit
    def xla_two_gathers(storage, envs, cols):
        def body(acc, ec):
            env, col = ec
            a = window_gather_reference(storage, env, col - (F - 1), F)
            b = window_gather_reference(storage, env,
                                        col + N_STEP - (F - 1), F)
            return acc + checksum(a) + checksum(b), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), (envs, cols))
        return acc

    def make_pallas_fused(group):
        @jax.jit
        def f(padded, envs, cols):
            def body(acc, ec):
                env, col = ec
                u = fused_union_gather(padded, env, col - (F - 1), W,
                                       group=group)
                a, b = split_union(u, F, N_STEP, OBS)
                return acc + checksum(a) + checksum(b), None
            acc, _ = jax.lax.scan(body, jnp.int32(0), (envs, cols))
            return acc
        return f

    @jax.jit
    def pallas_single(storage, envs, cols):
        def body(acc, ec):
            env, col = ec
            a = window_gather(storage, env, col - (F - 1), F)
            b = window_gather(storage, env, col + N_STEP - (F - 1), F)
            return acc + checksum(a) + checksum(b), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), (envs, cols))
        return acc

    def run(name, fn, *args, reps=4):
        acc = fn(*args)            # compile + warm
        ref = int(np.asarray(acc))  # hard sync
        t0 = time.perf_counter()
        for _ in range(reps):
            acc = fn(*args)
        int(np.asarray(acc))
        dt = (time.perf_counter() - t0) / (reps * K)
        print(f"{name:28s} {dt*1e3:7.3f} ms/gather  checksum={ref}")
        return dt, ref

    _, c_a = run("A xla_two_gathers", xla_two_gathers, storage,
                 envs, cols)
    for g in groups:
        _, c_b = run(f"B pallas_fused group={g}",
                     make_pallas_fused(g), padded, envs, cols)
        assert c_b == c_a, "checksum mismatch vs XLA"
    try:
        _, c_c = run("C pallas_single_window", pallas_single, storage,
                     envs, cols)
        assert c_c == c_a
    except Exception as e:  # r3 toolchain: raw-frame slices (dim 84)
        print(f"C pallas_single_window: does not compile ({type(e).__name__}; "
              "see ops/pallas_gather.py STATUS)")


if __name__ == "__main__":
    main()
