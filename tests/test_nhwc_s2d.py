"""Correctness of the r5 gather-plane candidates (CPU, exact math):

* frame_stack_union_gather_nhwc == transpose(frame_stack_union_gather)
  bit-for-bit (same union window + validity masks, different axis
  order out of the gather).
* channels_last Nature-CNN == plain Nature-CNN on transposed input
  with the SAME params (the option only changes the input contract).
* space_to_depth Nature-CNN is an EXACT reparametrization: rearranged
  conv_0 kernels reproduce the plain torso's output.
* a full learner update with channels_last matches the plain path
  numerically (same samples, same TD errors).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rltime_tpu.history.replay import (
    ReplayConfig, frame_stack_union_gather,
    frame_stack_union_gather_nhwc, replay_init, replay_insert,
)
from rltime_tpu.models.policy import ModelConfig, init_params, make_model
from rltime_tpu.training.learner import (
    AlgoConfig, make_train_state, make_update_step,
)

E, T, L, F, N = 4, 64, 8, 4, 3


def _filled_replay(prioritized=True):
    cfg = ReplayConfig(num_envs=E, steps_per_env=T, horizon=N,
                       chunk_len=L, lookback=F - 1,
                       prioritized=prioritized)
    fields = {"obs": ((12, 10), jnp.uint8),
              "action": ((), jnp.int32),
              "reward": ((), jnp.float32),
              "terminated": ((), jnp.bool_),
              "done": ((), jnp.bool_)}
    state = replay_init(cfg, fields)
    rng = np.random.default_rng(3)
    for _ in range(5):
        state = replay_insert(cfg, state, dict(
            obs=rng.integers(0, 255, size=(E, L, 12, 10),
                             dtype=np.uint8),
            action=rng.integers(0, 6, size=(E, L)).astype(np.int32),
            reward=rng.normal(size=(E, L)).astype(np.float32),
            terminated=(rng.random((E, L)) < 0.1),
            done=(rng.random((E, L)) < 0.15)))
    return cfg, state


def test_nhwc_union_gather_matches_transposed():
    cfg, state = _filled_replay()
    rng = np.random.default_rng(0)
    env = jnp.asarray(rng.integers(0, E, size=(32,)), jnp.int32)
    col = jnp.asarray(rng.integers(F, 24, size=(32,)), jnp.int32)
    a_t, a_tn = frame_stack_union_gather(cfg, state, env, col, F, N)
    b_t, b_tn = frame_stack_union_gather_nhwc(cfg, state, env, col,
                                              F, N)
    np.testing.assert_array_equal(np.moveaxis(np.asarray(a_t), 1, -1),
                                  np.asarray(b_t))
    np.testing.assert_array_equal(np.moveaxis(np.asarray(a_tn), 1, -1),
                                  np.asarray(b_tn))


def _nature_cfgs(**kw):
    return ModelConfig(num_actions=5, torso="nature_cnn",
                       head="dueling", compute_dtype="float32", **kw)


def test_channels_last_same_params_same_output():
    cfg = _nature_cfgs()
    cfg_cl = _nature_cfgs(channels_last=True)
    obs = jnp.asarray(
        np.random.default_rng(1).integers(0, 255, size=(3, F, 84, 84),
                                          dtype=np.uint8))
    params = init_params(cfg, jax.random.key(0), obs[:1])
    q, _ = make_model(cfg).apply(params, obs, ())
    q_cl, _ = make_model(cfg_cl).apply(params, jnp.moveaxis(obs, 1, -1),
                                       ())
    np.testing.assert_allclose(np.asarray(q), np.asarray(q_cl),
                               rtol=0, atol=1e-5)


def test_space_to_depth_exact_reparametrization():
    cfg = _nature_cfgs()
    cfg_s2d = _nature_cfgs(space_to_depth=True)
    obs = jnp.asarray(
        np.random.default_rng(2).integers(0, 255, size=(3, F, 84, 84),
                                          dtype=np.uint8))
    params = init_params(cfg, jax.random.key(0), obs[:1])

    # conv_0 kernel (8, 8, C, 32) -> s2d form (2, 2, 16*C, 32):
    # ki = 4*pi + ri, and the s2d input channel is (ri, rj, c)
    # flattened in that order (torso reshape), so reorder to
    # (pi, pj, ri, rj, c, out).
    def rewrite(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = rewrite(v)
            elif (hasattr(v, "ndim") and v.ndim == 4
                    and v.shape[:2] == (8, 8)):
                c = v.shape[2]
                w = v.reshape(2, 4, 2, 4, c, v.shape[3])
                w = jnp.transpose(w, (0, 2, 1, 3, 4, 5))
                out[k] = w.reshape(2, 2, 16 * c, v.shape[3])
            else:
                out[k] = v
        return out

    p2 = rewrite(jax.tree.map(lambda x: x, params))
    q, _ = make_model(cfg).apply(params, obs, ())
    q2, _ = make_model(cfg_s2d).apply(p2, obs, ())
    np.testing.assert_allclose(np.asarray(q), np.asarray(q2),
                               rtol=0, atol=2e-4)


@pytest.mark.parametrize("s2d", [False, True])
def test_learner_update_channels_last_matches(s2d):
    rcfg, rstate = _filled_replay()
    acfg = AlgoConfig(algo="dqn", batch_size=16, n_step=N,
                      double_q=True, lr=1e-3)
    obs_ex = jnp.zeros((1, F, 12, 10), jnp.uint8)
    mcfg = ModelConfig(num_actions=6, torso="nature_cnn",
                       head="dueling", compute_dtype="float32",
                       cnn_channels=(8,), cnn_fc=32)
    # tiny images aren't divisible geometry for s2d — use 84x84 full
    # geometry only for the s2d variant check above; here compare the
    # plain vs channels_last UPDATE on the small ring (s2d needs
    # 84x84, skip that combination at this shape)
    if s2d:
        pytest.skip("s2d exactness is covered on real geometry above")
    mcfg_cl = ModelConfig(num_actions=6, torso="nature_cnn",
                          head="dueling", compute_dtype="float32",
                          cnn_channels=(8,), cnn_fc=32,
                          channels_last=True)
    ts = make_train_state(mcfg, acfg, jax.random.key(7), obs_ex)
    upd = jax.jit(make_update_step(mcfg, acfg, rcfg, F, False))
    upd_cl = jax.jit(make_update_step(mcfg_cl, acfg, rcfg, F, False))
    beta = jnp.float32(0.5)
    ts1, rs1, m1 = upd(ts, rstate, beta)
    ts2, rs2, m2 = upd_cl(ts, rstate, beta)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1["td_abs"]),
                               float(m2["td_abs"]), rtol=1e-5)
    l1 = jax.tree.leaves(ts1.params)
    l2 = jax.tree.leaves(ts2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5)
