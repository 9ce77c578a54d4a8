"""Sum-tree invariants and sampling distribution (SURVEY.md §4 item 1)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rltime_tpu.ops import sum_tree


def _check_invariant(tree):
    """Every internal node equals the sum of its children."""
    t = np.asarray(tree)
    n = len(t) // 2
    for i in range(1, n):
        assert t[i] == pytest.approx(t[2 * i] + t[2 * i + 1], rel=1e-5), i


def test_init_zero():
    tree = sum_tree.init(100)
    assert tree.shape == (256,)  # next pow2 = 128 leaves
    assert float(sum_tree.total(tree)) == 0.0


def test_set_and_total():
    tree = sum_tree.init(8)
    idx = jnp.array([0, 3, 7])
    p = jnp.array([1.0, 2.0, 3.0])
    tree = sum_tree.set_priorities(tree, idx, p)
    assert float(sum_tree.total(tree)) == pytest.approx(6.0)
    np.testing.assert_allclose(sum_tree.get(tree, idx), [1.0, 2.0, 3.0])
    _check_invariant(tree)


def test_overwrite():
    tree = sum_tree.init(8)
    tree = sum_tree.set_priorities(
        tree, jnp.array([2, 5]), jnp.array([4.0, 1.0]))
    tree = sum_tree.set_priorities(
        tree, jnp.array([2]), jnp.array([0.5]))
    assert float(sum_tree.total(tree)) == pytest.approx(1.5)
    _check_invariant(tree)


def test_duplicate_indices_last_wins():
    tree = sum_tree.init(8)
    tree = sum_tree.set_priorities(
        tree, jnp.array([3, 3, 3]), jnp.array([9.0, 5.0, 2.0]))
    assert float(sum_tree.get(tree, jnp.array(3))) == pytest.approx(2.0)
    assert float(sum_tree.total(tree)) == pytest.approx(2.0)
    _check_invariant(tree)


def test_duplicates_mixed_with_unique():
    tree = sum_tree.init(16)
    idx = jnp.array([1, 4, 1, 9, 4, 4])
    p = jnp.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    tree = sum_tree.set_priorities(tree, idx, p)
    assert float(sum_tree.get(tree, jnp.array(1))) == pytest.approx(3.0)
    assert float(sum_tree.get(tree, jnp.array(4))) == pytest.approx(6.0)
    assert float(sum_tree.get(tree, jnp.array(9))) == pytest.approx(4.0)
    _check_invariant(tree)


def test_zero_priority_never_sampled(key):
    tree = sum_tree.init(16)
    live = jnp.array([2, 7, 11])
    tree = sum_tree.set_priorities(tree, live, jnp.array([1.0, 1.0, 1.0]))
    idx, p = sum_tree.sample(tree, key, 512)
    assert set(np.asarray(idx).tolist()) <= set(np.asarray(live).tolist())
    assert np.all(np.asarray(p) > 0)


def test_sampling_distribution_matches_priorities(key):
    """Chi-squared check: empirical freq ~ priority / total."""
    num = 8
    prios = jnp.array([1.0, 2.0, 4.0, 8.0, 0.5, 0.0, 3.0, 1.5])
    tree = sum_tree.set_priorities(
        sum_tree.init(num), jnp.arange(num), prios)
    draws = 50_000
    # iid (non-stratified) draws for a clean chi^2.
    idx, _ = sum_tree.sample(tree, key, draws, stratified=False)
    counts = np.bincount(np.asarray(idx), minlength=num)
    probs = np.asarray(prios) / float(np.sum(np.asarray(prios)))
    expected = probs * draws
    live = expected > 0
    chi2 = np.sum((counts[live] - expected[live]) ** 2 / expected[live])
    # dof = 6 live cells - 1; p=0.001 critical value ~ 22.5
    assert chi2 < 22.5, (counts, expected)
    assert counts[5] == 0


def test_stratified_sampling_lower_variance(key):
    prios = jnp.ones((64,))
    tree = sum_tree.set_priorities(
        sum_tree.init(64), jnp.arange(64), prios)
    idx, _ = sum_tree.sample(tree, key, 64, stratified=True)
    # Uniform priorities + stratified => exactly one draw per leaf.
    assert sorted(np.asarray(idx).tolist()) == list(range(64))


def test_jit_and_grad_free(key):
    tree = sum_tree.set_priorities(
        sum_tree.init(32), jnp.arange(32), jnp.ones((32,)))
    f = jax.jit(lambda t, k: sum_tree.sample(t, k, 16))
    idx, p = f(tree, key)
    assert idx.shape == (16,)
