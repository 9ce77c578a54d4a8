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


def main_fused():
    """--fused: compile the FLAGSHIP fused superstep on the 8-device
    CPU mesh and print the collective census + bytes-over-ICI model
    (VERDICT r4 Next #3; the structural version is pinned by
    tests/test_collective_census.py)."""
    import os
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import PartitionSpec as P
    import tempfile

    from rltime_tpu.parallel.fused import FusedApexTrainer
    from rltime_tpu.parallel.mesh import make_global_array
    from rltime_tpu.utils.hlo_census import (
        collective_census, summarize)

    cfg = {
        "seed": 0,
        "env": {"type": "minatar_breakout", "num_envs": 64},
        "model": {"torso": "minatar_cnn", "cnn_channels": [16],
                  "cnn_fc": 128, "head": "dueling"},
        "replay": {"steps_per_env": 512, "prioritized": True},
        "algo": {"algo": "dqn", "batch_size": 256, "n_step": 3,
                 "double_q": True, "lr": 2.5e-4,
                 "target_update_freq": 500},
        "train": {"total_env_steps": 10**9, "warmup_env_steps": 0,
                  "chunk_len": 16, "updates_per_chunk": 32,
                  "log_interval": 10**9,
                  "supersteps_per_dispatch": 1},
    }
    t = FusedApexTrainer(cfg, tempfile.mkdtemp())
    eps = make_global_array(t._eps(t.loop_cfg.chunk_len), t.mesh,
                            P(None, "data"))
    beta = make_global_array(np.float32(0.4), t.mesh, P())
    txt = t._super.lower(t.train_state, t.actor_state,
                         t.replay_state, eps, beta).compile().as_text()
    ents = collective_census(txt)
    print(summarize(ents))
    d = t.num_shards
    K = t.loop_cfg.updates_per_chunk
    params_b = sum(x.size * x.dtype.itemsize
                   for x in jax.tree.leaves(t.train_state.params))
    total_b = sum(e["bytes"] for e in ents)
    # ring-allreduce wire model: each all-reduce moves
    # 2*(d-1)/d * payload per device over ICI; the combined grad
    # all-reduce (+ metric pmeans) sits INSIDE the K-update scan body,
    # so it executes K times per superstep
    wire = K * sum(e["bytes"] * 2 * (d - 1) / d for e in ents)
    flops = None
    try:
        ca = t._super.lower(
            t.train_state, t.actor_state, t.replay_state, eps,
            beta).cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception:
        pass
    print(f"\nd={d} K={K} params={params_b:,d} B  "
          f"census_total={total_b:,d} B  "
          f"wire_per_device={wire:,.0f} B/superstep")
    if flops:
        print(f"flops/superstep={flops:,.0f}  "
              f"arith-intensity vs ICI: {flops / max(wire, 1):,.0f} "
              "FLOP/wire-byte")


if __name__ == "__main__":
    if "--fused" in sys.argv:
        sys.argv.remove("--fused")
        main_fused()
    else:
        main()
