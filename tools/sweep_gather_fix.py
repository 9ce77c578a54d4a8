"""Same-process A/B of the r4-diagnosed gather-plane candidates on the
driver-bench learner program (VERDICT r4 Next #1).

The r4 profile: the PER union obs gather accounts for ~31% of device
time (runs at HBM roofline isolated, ~12x slower inside the scanned
update program) plus a 12.5% u8 whole-batch NHWC relayout copy.
Candidates (all at the bench recipe ratio, batch 1024 x K=1, S=32):

  base     today's production program (cache-hit: the bench.py shape)
  barrier  optimization_barrier between gather and conv (control:
           forces the gather into its own kernel)
  unroll2/4  chunk-scan unroll (XLA can software-pipeline chunk k+1's
           gather against chunk k's convs)
  nhwc     channels-last union gather + NHWC torso (kills the
           relayout copy at the source)
  s2d      exact space-to-depth rewrite of conv_0 (8x8/4 C=4 ->
           2x2/1 C=64; attacks the 29% conv_0 plane)
  nhwc_s2d / nhwc_s2d_unroll2 / nhwc_unroll2  combinations

Usage: python tools/sweep_gather_fix.py [variant ...]   (default: all)
Each variant builds + times in THIS process (CLAUDE.md: A/B pairs in
the same process; compiles go through /tmp/jax_cache).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

VARIANTS = {
    "base": {},
    "barrier": dict(gather_barrier=True),
    "unroll2": dict(unroll=2),
    "unroll4": dict(unroll=4),
    "nhwc": dict(channels_last=True),
    "s2d": dict(space_to_depth=True),
    "nhwc_s2d": dict(channels_last=True, space_to_depth=True),
    "nhwc_unroll2": dict(channels_last=True, unroll=2),
    "nhwc_s2d_unroll2": dict(channels_last=True, space_to_depth=True,
                             unroll=2),
    "s2d_unroll2": dict(space_to_depth=True, unroll=2),
    # two-stage software pipeline (verdict candidate c): next batch
    # sampled+gathered during the current update's compute; one-update
    # priority staleness (make_pipelined_insert_and_update_step)
    "pipelined": dict(pipelined=True),
    "pipelined_nhwc": dict(pipelined=True, channels_last=True),
    "pipelined_unroll2": dict(pipelined=True, unroll=2),
    # superstep-depth check (r3 swept 8/16/32; r5: 64 wins +7%)
    "s64": dict(supersteps=64),
    "s96": dict(supersteps=96),
    "s128": dict(supersteps=128),
    "s64_nhwc": dict(supersteps=64, channels_last=True),
    "k2_b512": dict(batch=512, k=2),
    # bigger chunk/batch at the SAME 0.5 samples/insert ratio
    # (s32 pairs: the staged-chunk buffers double, so compare at S=32)
    "k7_b1024": dict(k=7),   # update-dominated ceiling (3.5x ratio)
    "base_s32": dict(supersteps=32),
    "L64_b2048_s32": dict(supersteps=32, chunk_len=64, batch=2048),
    "e128_b2048_s32": dict(supersteps=32, num_envs=128, batch=2048),
}


def run_variant(name, overrides, dispatches=4):
    import jax
    from rltime_tpu.utils import benchprog

    t_build = time.perf_counter()
    p = benchprog.build(**overrides)
    beta = jax.numpy.float32(0.4)
    warm = p.stacked(50)
    tstate, rstate, metrics = p.superstep(p.tstate, p.rstate, beta,
                                          warm)
    loss0 = float(np.asarray(metrics["loss"]))
    compile_s = time.perf_counter() - t_build

    chunks = [p.stacked(100 + p.S * i) for i in range(dispatches)]
    float(np.asarray(chunks[-1]["reward"][0, 0, 0]))
    t0 = time.perf_counter()
    for i in range(dispatches):
        tstate, rstate, metrics = p.superstep(tstate, rstate, beta,
                                              chunks[i])
    float(np.asarray(metrics["loss"]))
    dt = time.perf_counter() - t0
    tx = dispatches * p.S * p.K * p.tx_per_update / dt
    print(f"RESULT {name}: {tx:,.0f} tx/s  "
          f"(compile+warm {compile_s:.1f}s, loss0 {loss0:.4f})",
          flush=True)
    del p, tstate, rstate, chunks
    return tx


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      0.5)
    names = sys.argv[1:] or list(VARIANTS)
    results = {}
    for n in names:
        print(f"--- building {n} ...", flush=True)
        results[n] = run_variant(n, VARIANTS[n])
    print("\nSummary (tx/s):")
    base = results.get("base")
    for n, v in sorted(results.items(), key=lambda kv: -kv[1]):
        rel = f"  ({v / base - 1:+.1%} vs base)" if base else ""
        print(f"  {n:20s} {v:>10,.0f}{rel}")


if __name__ == "__main__":
    main()
