"""Q-value heads: linear, dueling, IQN (SURVEY.md §2 "Models").

Dueling: Q = V + A - mean_a A (the reference's aggregation identity —
tested in tests/test_models.py). IQN: cosine tau embedding (64 basis),
elementwise product with the torso features, shared head over taus.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class LinearQHead(nn.Module):
    num_actions: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat):
        return nn.Dense(self.num_actions, dtype=jnp.float32)(feat)


class DuelingQHead(nn.Module):
    num_actions: int
    hidden: int = 256
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat):
        v = nn.Dense(self.hidden, dtype=self.compute_dtype)(feat)
        v = nn.relu(v)
        v = nn.Dense(1, dtype=jnp.float32)(v.astype(jnp.float32))
        a = nn.Dense(self.hidden, dtype=self.compute_dtype)(feat)
        a = nn.relu(a)
        a = nn.Dense(self.num_actions, dtype=jnp.float32)(
            a.astype(jnp.float32))
        return v + a - jnp.mean(a, axis=-1, keepdims=True)


class IQNHead(nn.Module):
    """Implicit-quantile head (SURVEY.md §3.3 IQN path).

    phi(tau) = relu(Dense(cos(pi * i * tau), i = 0..embed_dim-1));
    quantile features = feat * phi(tau); head maps to per-action
    quantile values. Dueling aggregation optionally applied per tau.
    """
    num_actions: int
    embed_dim: int = 64
    dueling: bool = False
    hidden: int = 256
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, taus):
        """feat (B, D); taus (B, N) -> quantile values (B, N, A)."""
        B, N = taus.shape
        i = jnp.arange(self.embed_dim, dtype=jnp.float32)
        cos = jnp.cos(jnp.pi * taus[..., None] * i)        # (B, N, E)
        phi = nn.Dense(feat.shape[-1], dtype=self.compute_dtype,
                       name="tau_embed")(cos.astype(self.compute_dtype))
        phi = nn.relu(phi)                                  # (B, N, D)
        h = feat[:, None, :].astype(self.compute_dtype) * phi
        if self.dueling:
            v = nn.Dense(self.hidden, dtype=self.compute_dtype)(h)
            v = nn.relu(v)
            v = nn.Dense(1, dtype=jnp.float32)(v.astype(jnp.float32))
            a = nn.Dense(self.hidden, dtype=self.compute_dtype)(h)
            a = nn.relu(a)
            a = nn.Dense(self.num_actions, dtype=jnp.float32)(
                a.astype(jnp.float32))
            q = v + a - jnp.mean(a, axis=-1, keepdims=True)
        else:
            q = nn.Dense(self.hidden, dtype=self.compute_dtype)(h)
            q = nn.relu(q)
            q = nn.Dense(self.num_actions, dtype=jnp.float32)(
                q.astype(jnp.float32))
        return q  # (B, N, A)
