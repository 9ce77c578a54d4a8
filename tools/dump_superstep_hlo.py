"""Dump the optimized HLO of bench.py's fused superstep; grep copies.

Prints every `copy` instruction with its shape+layout so ring-sized
relayout copies can be attributed (companion to tools/profile_bench.py).

Usage:  timeout 550 python tools/dump_superstep_hlo.py [out.txt]
"""
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/superstep_hlo.txt"
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from rltime_tpu.history.replay import (
        ReplayConfig, replay_init, replay_insert)
    from rltime_tpu.models.policy import ModelConfig
    from rltime_tpu.training.learner import (
        AlgoConfig, make_train_state, make_update_step,
        make_insert_and_update_step)

    E, T, L, F, n_step = 64, 1024, 32, 4, 3
    batch = 256
    rcfg = ReplayConfig(num_envs=E, steps_per_env=T, horizon=n_step,
                        chunk_len=L, lookback=F - 1, prioritized=True)
    mcfg = ModelConfig(num_actions=6, torso="nature_cnn",
                       head="dueling", compute_dtype="bfloat16")
    acfg = AlgoConfig(algo="dqn", batch_size=batch, n_step=n_step,
                      double_q=True, lr=1e-4, target_update_freq=500)
    fields = {"obs": ((84, 84), jnp.uint8),
              "action": ((), jnp.int32),
              "reward": ((), jnp.float32),
              "terminated": ((), jnp.bool_),
              "done": ((), jnp.bool_)}
    rstate = replay_init(rcfg, fields)
    rng = np.random.default_rng(0)
    S = 4

    def chunk(k):
        return dict(
            obs=rng.integers(0, 255, size=(E, L, 84, 84), dtype=np.uint8),
            action=rng.integers(0, 6, size=(E, L)).astype(np.int32),
            reward=rng.normal(size=(E, L)).astype(np.float32),
            terminated=(rng.random((E, L)) < 0.02),
            done=(rng.random((E, L)) < 0.02))

    rstate = replay_insert(rcfg, rstate, chunk(0))

    ex_obs = jnp.zeros((1, F, 84, 84), jnp.uint8)
    tstate = make_train_state(mcfg, acfg, jax.random.key(0), ex_obs)
    update = make_update_step(mcfg, acfg, rcfg, F, False)
    insert_update = make_insert_and_update_step(rcfg, update, 4)

    def superstep(tstate, rstate, beta, chunks):
        for i in range(S):
            ck = {k: v[i] for k, v in chunks.items()}
            tstate, rstate, metrics = insert_update(tstate, rstate,
                                                    ck, beta)
        return tstate, rstate, metrics

    jitted = jax.jit(superstep, donate_argnums=(0, 1))

    def stacked(base):
        out = [chunk(base + i) for i in range(S)]
        return {k: jnp.asarray(np.stack([c[k] for c in out]))
                for k in out[0]}

    beta = jnp.float32(0.4)
    txt = jitted.lower(tstate, rstate, beta, stacked(1)) \
        .compile().as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out_path}")

    # Big copies: shape u8[...] with >=10^8 elements, or any named copy
    for line in txt.splitlines():
        s = line.strip()
        if re.match(r"%?copy(\.|\b)", s.split(" = ")[0].lstrip("%")) \
                or " = u8[64,1024,84,84]" in s:
            if "u8[64,1024" in s or "f32[64,1024" in s:
                print(s[:220])
    # entry computation layout + aliasing info
    for line in txt.splitlines():
        if "entry_computation_layout" in line or "alias" in line.lower():
            print(line.strip()[:300])


if __name__ == "__main__":
    main()
