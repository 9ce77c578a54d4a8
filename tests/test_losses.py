"""Loss golden tests: double-Q, Huber, IQN quantile-Huber vs numpy
reimplementation (SURVEY.md §4 item 1)."""
import jax.numpy as jnp
import numpy as np
import pytest

from rltime_tpu.ops import losses


def test_huber_regions():
    x = jnp.array([-3.0, -0.5, 0.0, 0.5, 2.0])
    h = losses.huber(x, kappa=1.0)
    np.testing.assert_allclose(
        np.asarray(h), [2.5, 0.125, 0.0, 0.125, 1.5], atol=1e-6)


def test_double_q_target_hand_computed():
    # online picks argmax, target evaluates (SURVEY.md §3.3).
    q_online = jnp.array([[1.0, 5.0, 2.0]])
    q_target = jnp.array([[10.0, 20.0, 30.0]])
    y = losses.double_q_target(q_online, q_target,
                               jnp.array([2.0]), jnp.array([0.9]))
    assert float(y[0]) == pytest.approx(2.0 + 0.9 * 20.0)


def test_double_q_target_terminal():
    y = losses.double_q_target(
        jnp.ones((1, 4)), jnp.ones((1, 4)) * 7.0,
        jnp.array([3.0]), jnp.array([0.0]))
    assert float(y[0]) == pytest.approx(3.0)


def test_q_learning_loss_and_td():
    q = jnp.array([[0.0, 2.0], [1.0, 3.0]])
    actions = jnp.array([1, 0])
    targets = jnp.array([2.5, -1.0])
    loss, td = losses.q_learning_loss(q, actions, targets)
    np.testing.assert_allclose(np.asarray(td), [0.5, 2.0], atol=1e-6)
    expect = np.mean([0.5 * 0.25, 2.0 - 0.5])
    assert float(loss) == pytest.approx(expect)


def test_q_learning_loss_weights():
    q = jnp.array([[1.0], [1.0]])
    actions = jnp.array([0, 0])
    targets = jnp.array([1.5, 1.5])
    w = jnp.array([0.0, 2.0])
    loss, _ = losses.q_learning_loss(q, actions, targets, weights=w)
    assert float(loss) == pytest.approx(0.5 * 0.25 * 2.0 / 2)


def numpy_quantile_huber(pred, taus, target, kappa=1.0):
    B, N = pred.shape
    Np = target.shape[1]
    out = np.zeros(B)
    for b in range(B):
        acc = np.zeros(N)
        for j in range(Np):
            for i in range(N):
                u = target[b, j] - pred[b, i]
                au = abs(u)
                h = 0.5 * min(au, kappa) ** 2 + kappa * (au - min(au, kappa))
                rho = abs(taus[b, i] - (1.0 if u < 0 else 0.0)) * h / kappa
                acc[i] += rho / Np
        out[b] = acc.sum()
    return out


def test_quantile_huber_vs_numpy():
    rng = np.random.default_rng(3)
    B, N, Np = 4, 5, 7
    pred = rng.normal(size=(B, N)).astype(np.float32)
    taus = rng.random((B, N)).astype(np.float32)
    target = rng.normal(size=(B, Np)).astype(np.float32)
    loss, td = losses.quantile_huber_loss(
        jnp.array(pred), jnp.array(taus), jnp.array(target))
    expect = numpy_quantile_huber(pred, taus, target)
    assert float(loss) == pytest.approx(float(expect.mean()), abs=1e-5)
    # |td| priority signal: mean abs pairwise residual
    u = target[:, :, None] - pred[:, None, :]
    np.testing.assert_allclose(
        np.asarray(td), np.abs(u).mean(axis=(1, 2)), atol=1e-5)


def test_quantile_huber_perfect_prediction_near_zero():
    # Identical point masses => only the tau-asymmetry term at u=0 remains 0.
    pred = jnp.zeros((2, 4))
    taus = jnp.full((2, 4), 0.5)
    target = jnp.zeros((2, 4))
    loss, td = losses.quantile_huber_loss(pred, taus, target)
    assert float(loss) == pytest.approx(0.0, abs=1e-7)
    assert float(td.sum()) == pytest.approx(0.0, abs=1e-7)


def test_sequence_priority_mix():
    td = jnp.array([[1.0, 3.0, 2.0, 100.0]])
    mask = jnp.array([[1.0, 1.0, 1.0, 0.0]])
    p = losses.sequence_priority(td, mask, eta=0.75)
    assert float(p[0]) == pytest.approx(0.75 * 3.0 + 0.25 * 2.0)


def test_batched_next_forward_matches_unbatched():
    """algo.batched_next_forward (MFU lever: the two gradient-free
    next-obs forwards as ONE stacked-params vmap apply) must produce
    the same update as the two-apply path."""
    import jax
    from rltime_tpu.history.replay import (
        ReplayConfig, replay_init, replay_insert)
    from rltime_tpu.models.policy import ModelConfig
    from rltime_tpu.training.learner import (
        AlgoConfig, make_train_state, make_update_step)

    rcfg = ReplayConfig(num_envs=4, steps_per_env=64, horizon=2,
                        chunk_len=8, prioritized=True)
    mcfg = ModelConfig(num_actions=3, torso="mlp", mlp_hidden=(16,),
                       head="dueling", dueling_hidden=8)
    rng = np.random.default_rng(0)
    fields = {"obs": ((5,), jnp.float32), "action": ((), jnp.int32),
              "reward": ((), jnp.float32),
              "terminated": ((), jnp.bool_), "done": ((), jnp.bool_)}
    rstate = replay_init(rcfg, fields)
    for _ in range(4):
        rstate = replay_insert(rcfg, rstate, dict(
            obs=rng.normal(size=(4, 8, 5)).astype(np.float32),
            action=rng.integers(0, 3, (4, 8)).astype(np.int32),
            reward=rng.normal(size=(4, 8)).astype(np.float32),
            terminated=(rng.random((4, 8)) < 0.05),
            done=(rng.random((4, 8)) < 0.05)))
    outs = []
    for flag in (False, True):
        acfg = AlgoConfig(algo="dqn", batch_size=8, n_step=2,
                          double_q=True, lr=1e-3,
                          batched_next_forward=flag)
        ts = make_train_state(mcfg, acfg, jax.random.key(0),
                              jnp.zeros((1, 5)))
        upd = jax.jit(make_update_step(mcfg, acfg, rcfg, 1, True))
        nt, _, m = upd(ts, rstate, jnp.float32(0.4))
        outs.append((float(m["loss"]),
                     jax.tree.leaves(jax.device_get(nt.params))))
    assert outs[0][0] == pytest.approx(outs[1][0], abs=1e-6)
    for a, b in zip(outs[0][1], outs[1][1]):
        np.testing.assert_allclose(a, b, atol=1e-6)


def _ff_lambda_setup(n_step, use_lambda, lambda_, seed=0):
    import jax
    from rltime_tpu.history.replay import (
        ReplayConfig, replay_init, replay_insert)
    from rltime_tpu.models.policy import ModelConfig
    from rltime_tpu.training.learner import (
        AlgoConfig, make_train_state, make_update_step)
    rcfg = ReplayConfig(num_envs=4, steps_per_env=64, horizon=n_step,
                        chunk_len=8, prioritized=True)
    mcfg = ModelConfig(num_actions=3, torso="mlp", mlp_hidden=(16,),
                       head="linear")
    rng = np.random.default_rng(seed)
    fields = {"obs": ((5,), jnp.float32), "action": ((), jnp.int32),
              "reward": ((), jnp.float32),
              "terminated": ((), jnp.bool_), "done": ((), jnp.bool_)}
    rstate = replay_init(rcfg, fields)
    for _ in range(5):
        term = rng.random((4, 8)) < 0.15
        done = term | (rng.random((4, 8)) < 0.05)   # some truncations
        rstate = replay_insert(rcfg, rstate, dict(
            obs=rng.normal(size=(4, 8, 5)).astype(np.float32),
            action=rng.integers(0, 3, (4, 8)).astype(np.int32),
            reward=rng.normal(size=(4, 8)).astype(np.float32),
            terminated=term, done=done))
    acfg = AlgoConfig(algo="dqn", batch_size=8, n_step=n_step,
                      double_q=True, lr=1e-3, use_lambda=use_lambda,
                      lambda_=lambda_)
    ts = make_train_state(mcfg, acfg, jax.random.key(0),
                          jnp.zeros((1, 5)))
    upd = jax.jit(make_update_step(mcfg, acfg, rcfg, 1, True))
    nt, nr, m = upd(ts, rstate, jnp.float32(0.4))
    return (float(m["loss"]),
            jax.tree.leaves(jax.device_get(nt.params)),
            np.asarray(nr.tree))


@pytest.mark.parametrize("n_step,lam", [(1, 0.7), (3, 1.0)])
def test_ff_lambda_reduces_to_nstep(n_step, lam):
    """FF Q(lambda) (SURVEY.md §0 item 3 on the feed-forward path)
    must reduce EXACTLY to the n-step path in its two degenerate
    corners: n=1 (any lambda — the recursion closes immediately on
    V_1) and lambda=1.0 (the recursion telescopes to the full n-step
    return bootstrapping V_n)."""
    loss_a, params_a, tree_a = _ff_lambda_setup(n_step, False, lam)
    loss_b, params_b, tree_b = _ff_lambda_setup(n_step, True, lam)
    assert loss_a == pytest.approx(loss_b, abs=1e-6)
    for x, y in zip(params_a, params_b):
        np.testing.assert_allclose(x, y, atol=1e-6)
    np.testing.assert_allclose(tree_a, tree_b, atol=1e-5)


def test_ff_lambda_intermediate_differs_and_learns_shape():
    """0 < lambda < 1 with n > 1 must produce a DIFFERENT (but finite)
    update than pure n-step — the mode is not a no-op."""
    loss_a, params_a, _ = _ff_lambda_setup(3, False, 0.5, seed=2)
    loss_b, params_b, _ = _ff_lambda_setup(3, True, 0.5, seed=2)
    assert np.isfinite(loss_b)
    assert any(not np.allclose(x, y)
               for x, y in zip(params_a, params_b))
