"""Pallas window-gather kernel: interpret-mode equivalence on CPU
(the TPU path is validated in the perf logs; same kernel code)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rltime_tpu.ops.pallas_gather import (
    window_gather, window_gather_reference,
)


@pytest.mark.parametrize("window", [1, 4, 7])
def test_matches_reference(window, key):
    rng = np.random.default_rng(0)
    storage = jnp.array(rng.integers(0, 255, (8, 64, 12, 16),
                                     dtype=np.uint8))
    env = jnp.array(rng.integers(0, 8, 32), jnp.int32)
    col = jnp.array(rng.integers(-5, 64 + 20, 32), jnp.int32)
    out = window_gather(storage, env, col, window, interpret=True)
    ref = window_gather_reference(storage, env, col, window)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_ring_seam_windows():
    rng = np.random.default_rng(1)
    storage = jnp.array(rng.normal(size=(4, 32, 8)).astype(np.float32))
    env = jnp.array([0, 1, 2, 3], jnp.int32)
    col = jnp.array([30, 31, 29, 0], jnp.int32)  # windows cross T=32
    out = window_gather(storage, env, col, 4, interpret=True)
    ref = window_gather_reference(storage, env, col, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_float32_payload():
    rng = np.random.default_rng(2)
    storage = jnp.array(rng.normal(size=(2, 16, 4, 4))
                        .astype(np.float32))
    env = jnp.zeros((8,), jnp.int32)
    col = jnp.arange(8, dtype=jnp.int32)
    out = window_gather(storage, env, col, 2, interpret=True)
    ref = window_gather_reference(storage, env, col, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_fused_union_gather_matches_reference():
    """Fused stack+n-step union kernel (grouped in-flight DMAs):
    interpret-mode equivalence incl. ring-seam windows + the
    split_union stack extraction vs frame-window math."""
    from rltime_tpu.ops.pallas_gather import (
        fused_union_gather, pad_rows, split_union,
    )
    rng = np.random.default_rng(3)
    E, T, F, n = 4, 32, 4, 3
    W = F + n
    storage = jnp.array(rng.integers(0, 255, (E, T, 12, 16),
                                     dtype=np.uint8))
    padded = pad_rows(storage)
    assert padded.shape == (E, T, 1024)  # 192 -> one (8,128) tile row
    B = 16
    env = jnp.array(rng.integers(0, E, B), jnp.int32)
    col = jnp.array(rng.integers(0, T, B), jnp.int32)  # incl. seams
    col0 = col - (F - 1)
    out = fused_union_gather(padded, env, col0, W, group=4,
                             interpret=True)
    ref = window_gather_reference(padded, env, col0, W)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    obs_t, obs_tn = split_union(out, F, n, (12, 16))
    # stack semantics: obs_t rows are cols [col-F+1, col] oldest
    # first; obs_tn the same at col+n
    exp_t = window_gather_reference(storage, env, col - (F - 1), F)
    exp_tn = window_gather_reference(storage, env,
                                     col + n - (F - 1), F)
    np.testing.assert_array_equal(np.asarray(obs_t), np.asarray(exp_t))
    np.testing.assert_array_equal(np.asarray(obs_tn),
                                  np.asarray(exp_tn))
