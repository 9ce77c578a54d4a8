"""A/B sweep of supersteps-per-dispatch (S) for the driver bench
program, all in ONE process (CLAUDE.md: chip speed varies run to run,
so A/B pairs must share a process).

The jitted superstep from utils/benchprog.py scans over the leading
axis of the chunk stack, so one program definition serves every S
(each S compiles its own shape through the persistent cache). Prints
transitions/s per S; use to pick bench.py's S.

Usage: timeout 1800 python tools/sweep_superstep.py [S ...]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from rltime_tpu.utils import benchprog

    sweep = [int(a) for a in sys.argv[1:]] or [8, 16, 32]
    p = benchprog.build()
    beta = jnp.float32(0.4)

    def stacked(base, s):
        out = [p.chunk(base + i) for i in range(s)]
        return {k: jnp.asarray(np.stack([c[k] for c in out]))
                for k in out[0]}

    results = {}
    for n, s in enumerate(sweep):
        if n > 0:
            # p.tstate/p.rstate were donated by the previous S's first
            # call — rebuild fresh state (cheap vs the measurements)
            p = benchprog.build()
        tstate, rstate = p.tstate, p.rstate
        # compile + warm at this S
        t0 = time.perf_counter()
        tstate, rstate, m = p.superstep(tstate, rstate, beta,
                                        stacked(50, s))
        float(np.asarray(m["loss"]))
        compile_s = time.perf_counter() - t0
        # enough dispatches to cover ~64 supersteps total
        dispatches = max(2, 64 // s)
        chunks = [stacked(100 + s * i, s) for i in range(dispatches)]
        float(np.asarray(chunks[-1]["reward"][0, 0, 0]))
        t0 = time.perf_counter()
        for c in chunks:
            tstate, rstate, m = p.superstep(tstate, rstate, beta, c)
        float(np.asarray(m["loss"]))
        dt = time.perf_counter() - t0
        tx = dispatches * s * p.K * p.batch / dt
        results[s] = tx
        print(f"S={s:3d}: {tx:12,.1f} tx/s "
              f"({dispatches} dispatches, {dt*1e3/dispatches:.1f} "
              f"ms/dispatch, first-call {compile_s:.1f}s)")

    best = max(results, key=results.get)
    print(f"best: S={best} at {results[best]:,.1f} tx/s")


if __name__ == "__main__":
    main()
