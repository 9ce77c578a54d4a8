"""Trace bench.py's EXACT fused superstep program and print top HLO ops.

The program is built by the same rltime_tpu/utils/benchprog.py
definition bench.py runs, so optimization work targets what the driver
actually measures (tools/profile_update.py profiles the older
multi-update-only program).

Usage:  timeout 550 python tools/profile_bench.py [variant]
`variant` (optional) names a tools/sweep_gather_fix.py program
variant (base, nhwc, s2d, ...) so each candidate's device-time
attribution can be compared against base.
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from rltime_tpu.utils import benchprog

    overrides = {}
    if len(sys.argv) > 1:
        from sweep_gather_fix import VARIANTS
        overrides = VARIANTS[sys.argv[1]]
        print(f"variant {sys.argv[1]}: {overrides}")
    p = benchprog.build(**overrides)
    S = p.S
    beta = jnp.float32(0.4)
    tstate, rstate, m = p.superstep(p.tstate, p.rstate, beta,
                                    p.stacked(20))
    float(np.asarray(m["loss"]))

    tdir = "/tmp/profile_bench"
    os.system(f"rm -rf {tdir}")
    dev_chunks = [p.stacked(100 + S * i) for i in range(2)]
    float(np.asarray(dev_chunks[-1]["reward"][0, 0, 0]))
    with jax.profiler.trace(tdir):
        for i in range(2):
            tstate, rstate, m = p.superstep(tstate, rstate, beta,
                                            dev_chunks[i])
        float(np.asarray(m["loss"]))

    paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace written")
        return
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    dev_pids = {p for p, nm in pid_names.items()
                if "TPU" in nm or "/device" in nm.lower()}
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))
        agg[name] += dur
        cnt[name] += 1
        total += dur
    print(f"device-event total {total/1e3:.2f} ms over 2 dispatches "
          f"x {S}x(insert+{p.K} upd) "
          f"({total/(2*S*p.K)/1e3:.3f} ms/update if exclusive)")
    for name, us in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{us/1e3:9.3f} ms  x{cnt[name]:<5d} {name[:100]}")


if __name__ == "__main__":
    main()
