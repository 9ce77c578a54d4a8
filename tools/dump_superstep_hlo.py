"""Dump the optimized HLO of bench.py's fused superstep; grep copies.

Prints every `copy` instruction with its shape+layout so ring-sized
relayout copies can be attributed (companion to tools/profile_bench.py).
The program is EXACTLY what the driver measures: it is built by the
same rltime_tpu/utils/benchprog.py definition bench.py runs (S=16
lax.scan of {chunk insert + 4 updates}).

Usage:  timeout 550 python tools/dump_superstep_hlo.py [out.txt]
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/superstep_hlo.txt"
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from rltime_tpu.utils import benchprog

    p = benchprog.build()
    beta = jnp.float32(0.4)
    txt = p.superstep.lower(p.tstate, p.rstate, beta,
                            p.stacked(1)).compile().as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out_path}")

    # Big copies: ring-shaped u8/f32 arrays appearing in copy ops
    ring = f"[{benchprog.E},{benchprog.T}"
    for line in txt.splitlines():
        s = line.strip()
        if re.match(r"%?copy(\.|\b)", s.split(" = ")[0].lstrip("%")) \
                or f" = u8{ring}" in s:
            if f"u8{ring}" in s or f"f32{ring}" in s:
                print(s[:220])
    # entry computation layout + aliasing info
    for line in txt.splitlines():
        if "entry_computation_layout" in line or "alias" in line.lower():
            print(line.strip()[:300])


if __name__ == "__main__":
    main()
