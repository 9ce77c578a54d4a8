"""n-step / lambda return golden tests vs brute force (SURVEY.md §4 item 1)."""
import jax.numpy as jnp
import numpy as np
import pytest

from rltime_tpu.ops import returns


def brute_nstep(r, term, gamma):
    """O(n^2) reference implementation."""
    n = len(r)
    ret = 0.0
    disc = gamma ** n
    for i in range(n):
        dead = any(term[j] for j in range(i))
        if not dead:
            ret += (gamma ** i) * r[i]
        if term[i]:
            disc = 0.0
    return ret, disc


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("n", [1, 3, 5])
def test_nstep_matches_bruteforce(seed, n):
    rng = np.random.default_rng(seed)
    B = 7
    r = rng.normal(size=(B, n)).astype(np.float32)
    term = rng.random((B, n)) < 0.3
    ret, disc = returns.nstep_return(jnp.array(r), jnp.array(term), 0.97)
    for b in range(B):
        er, ed = brute_nstep(r[b], term[b], 0.97)
        assert float(ret[b]) == pytest.approx(er, abs=1e-5)
        assert float(disc[b]) == pytest.approx(ed, abs=1e-6)


def test_nstep_no_termination():
    r = jnp.array([[1.0, 2.0, 4.0]])
    term = jnp.zeros((1, 3), dtype=bool)
    ret, disc = returns.nstep_return(r, term, 0.5)
    assert float(ret[0]) == pytest.approx(1.0 + 0.5 * 2 + 0.25 * 4)
    assert float(disc[0]) == pytest.approx(0.125)


def test_nstep_immediate_termination():
    r = jnp.array([[3.0, 100.0]])
    term = jnp.array([[True, False]])
    ret, disc = returns.nstep_return(r, term, 0.9)
    assert float(ret[0]) == pytest.approx(3.0)  # reward at the terminal step counts
    assert float(disc[0]) == 0.0


def test_bootstrap_index():
    term = jnp.array([
        [False, False, False],
        [True, False, False],
        [False, True, False],
    ])
    idx = returns.nstep_bootstrap_index(term)
    np.testing.assert_array_equal(np.asarray(idx), [3, 1, 2])


def test_lambda_returns_reduce_to_nstep_when_lam1():
    """lam=1: G_0 = full discounted sum + bootstrap — cross-check."""
    rng = np.random.default_rng(0)
    n = 6
    r = rng.normal(size=(1, n)).astype(np.float32)
    v = rng.normal(size=(1, n)).astype(np.float32)
    term = np.zeros((1, n), dtype=bool)
    g = returns.lambda_returns(jnp.array(r), jnp.array(term),
                               jnp.array(v), 0.9, 1.0)
    expect = 0.0
    for i in reversed(range(n)):
        expect = r[0, i] + 0.9 * expect if i < n - 1 else r[0, i] + 0.9 * v[0, -1]
    assert float(g[0, 0]) == pytest.approx(expect, abs=1e-4)


def test_lambda_returns_lam0_is_one_step_td_target():
    r = jnp.array([[1.0, 2.0]])
    v = jnp.array([[5.0, 7.0]])
    term = jnp.zeros((1, 2), dtype=bool)
    g = returns.lambda_returns(r, term, v, 0.9, 0.0)
    assert float(g[0, 0]) == pytest.approx(1.0 + 0.9 * 5.0)
    assert float(g[0, 1]) == pytest.approx(2.0 + 0.9 * 7.0)


def test_lambda_returns_respect_termination():
    r = jnp.array([[1.0, 2.0, 3.0]])
    v = jnp.ones((1, 3)) * 100.0
    term = jnp.array([[True, False, False]])
    g = returns.lambda_returns(r, term, v, 0.9, 0.8)
    assert float(g[0, 0]) == pytest.approx(1.0)


def test_value_rescale_roundtrip():
    x = jnp.linspace(-50.0, 50.0, 101)
    y = returns.value_rescale_inv(returns.value_rescale(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-3)
    # h is monotone and compressive
    h = returns.value_rescale(x)
    assert np.all(np.diff(np.asarray(h)) > 0)
    assert float(returns.value_rescale(jnp.array(0.0))) == 0.0


def brute_truncation_mask(term, done):
    """First-boundary-is-truncation exclusion, scalar reference."""
    for i in range(len(done)):
        if done[i]:
            return 0.0 if not term[i] else 1.0
    return 1.0


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("n", [1, 3, 5])
def test_truncation_mask_matches_bruteforce(seed, n):
    rng = np.random.default_rng(100 + seed)
    B = 32
    term = rng.random((B, n)) < 0.25
    trunc = (~term) & (rng.random((B, n)) < 0.25)
    done = term | trunc
    m = returns.truncation_mask(jnp.array(term), jnp.array(done))
    for b in range(B):
        assert float(m[b]) == brute_truncation_mask(term[b], done[b]), b


def brute_suffix_mask(term, done):
    """Per-step lambda-return exclusion, scalar reference: step t is
    biased iff its episode segment ends in a truncation in-window."""
    L = len(done)
    out = np.ones(L)
    bad = False
    for t in range(L - 1, -1, -1):
        if done[t]:
            bad = not term[t]
        out[t] = 0.0 if bad else 1.0
    return out


@pytest.mark.parametrize("seed", range(4))
def test_truncation_suffix_mask_matches_bruteforce(seed):
    rng = np.random.default_rng(200 + seed)
    B, L = 16, 9
    term = rng.random((B, L)) < 0.2
    trunc = (~term) & (rng.random((B, L)) < 0.2)
    done = term | trunc
    m = returns.truncation_suffix_mask(jnp.array(term), jnp.array(done))
    for b in range(B):
        np.testing.assert_array_equal(
            np.asarray(m[b]), brute_suffix_mask(term[b], done[b]), str(b))
