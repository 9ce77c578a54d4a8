"""MFU sweep on the driver-bench learner program (round-3 verdict
Weak #1 / next-step #2): same-process A/B of

  * batched_next_forward: the two gradient-free next-obs forwards
    (double-Q online s' + target s') as ONE stacked-params vmap apply
    vs two separate applies;
  * batch size at FIXED sample ratio: (batch, K) in {(256,4), (512,2),
    (1024,1)} — transitions consumed per chunk stays 1024, so tx/s is
    comparable; larger batch = taller matmuls for the MXU.

All variants share utils/benchprog.build (the bench.py program) and
are timed in ONE process per CLAUDE.md (dispatch latency and chip
speed drift day to day). Prints one JSON line per variant.

    nohup python tools/sweep_mfu.py > /tmp/sweep_mfu.log 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")  # noqa: E402

import numpy as np  # noqa: E402

V5E_BF16_PEAK = 197e12


def run_variant(batch, k, batched_next, dispatches=4):
    import jax
    from rltime_tpu.utils import benchprog

    p = benchprog.build(batch=batch, k=k,
                        batched_next_forward=batched_next)
    beta = jax.numpy.float32(0.4)
    warm = p.stacked(50)
    flops = None
    try:
        ca = p.superstep.lower(p.tstate, p.rstate, beta,
                               warm).cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass
    t_compile = time.perf_counter()
    tstate, rstate, m = p.superstep(p.tstate, p.rstate, beta, warm)
    float(np.asarray(m["loss"]))
    t_compile = time.perf_counter() - t_compile

    chunks = [p.stacked(100 + p.S * i) for i in range(dispatches)]
    float(np.asarray(chunks[-1]["reward"][0, 0, 0]))
    t0 = time.perf_counter()
    for i in range(dispatches):
        tstate, rstate, m = p.superstep(tstate, rstate, beta,
                                        chunks[i])
    float(np.asarray(m["loss"]))
    dt = time.perf_counter() - t0
    tx_per_s = dispatches * p.S * p.K * p.batch / dt
    out = dict(batch=batch, k=k, batched_next=batched_next,
               tx_per_s=round(tx_per_s, 1),
               compile_s=round(t_compile, 1))
    if flops:
        fps = flops * dispatches / dt
        out["tflops_per_s"] = round(fps / 1e12, 2)
        out["mfu_pct"] = round(100 * fps / V5E_BF16_PEAK, 2)
    return out


def main():
    import jax
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           "/tmp/jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      0.5)
    variants = [(256, 4, False), (256, 4, True),
                (512, 2, False), (512, 2, True),
                (1024, 1, False), (1024, 1, True),
                # K=7 leg reconciles with the round-4 shadowing-bug
                # measurements (which silently ran K=7 at every
                # requested K — benchprog.build history)
                (1024, 7, True)]
    for b, k, bn in variants:
        r = run_variant(b, k, bn)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
