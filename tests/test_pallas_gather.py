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
