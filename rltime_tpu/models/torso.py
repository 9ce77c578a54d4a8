"""Embedding torsos: MLP and Nature-CNN (SURVEY.md §2 "Models").

TPU notes: conv/dense compute optionally runs in bfloat16 (params stay
f32; outputs are cast back) — MXU-friendly without touching the
exact-numerics CPU test path, which uses compute_dtype=float32.
Channel widths stay at the reference capacities (Nature CNN 32/64/64 +
FC-512) so learning-curve parity is apples-to-apples.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


class MLPTorso(nn.Module):
    hidden: Sequence[int] = (64, 64)
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.compute_dtype)
        x = x.reshape(x.shape[0], -1)
        for h in self.hidden:
            x = nn.Dense(h, dtype=self.compute_dtype)(x)
            x = nn.relu(x)
        return x.astype(jnp.float32)


class MinAtarCNNTorso(nn.Module):
    """MinAtar conv torso (Young & Tian 2019): 3x3/1 conv(s) + FC.

    Input: (B, H, W, C) binary planes (uint8 0/1 — cast, NOT /255), or
    (B, F, H, W, C) from the replay frame-window gather, in which case
    the frame axis is merged into channels (MinAtar uses F=1; the
    trail plane encodes motion).

    compute_dtype stays float32 by default ON PURPOSE: measured on
    v5e (r3, fused superstep A/B in one process) bf16 is ~30% SLOWER
    here — 132k vs 190k env-steps/s — because the 10x10x16 convs are
    too small for the MXU to pay back the cast/relayout overhead.
    (NatureCNNTorso, whose convs are big, defaults to bf16.)
    """
    channels: Sequence[int] = (16,)
    fc: int = 128
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if x.ndim == 5:
            b, f, h, w, c = x.shape
            x = jnp.moveaxis(x, 1, -2).reshape(b, h, w, f * c)
        x = x.astype(self.compute_dtype)
        for ch in self.channels:
            x = nn.Conv(ch, (3, 3), strides=(1, 1), padding="VALID",
                        dtype=self.compute_dtype)(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.fc, dtype=self.compute_dtype)(x)
        x = nn.relu(x)
        return x.astype(jnp.float32)


class NatureCNNTorso(nn.Module):
    """DeepMind Nature-DQN CNN: 8x8/4 -> 4x4/2 -> 3x3/1 -> FC 512.

    Input: (B, F, H, W) stacked uint8 frames or (B, H, W, C); frames are
    normalized to [0, 1] on device (keeps the host->device stream uint8:
    4x less HBM traffic than shipping f32).
    """
    channels: Sequence[int] = (32, 64, 64)
    fc: int = 512
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        if x.dtype == jnp.uint8:
            x = x.astype(self.compute_dtype) / 255.0
        else:
            x = x.astype(self.compute_dtype)
        if x.ndim == 4:
            # (B, F, H, W) -> NHWC with frames as channels.
            x = jnp.transpose(x, (0, 2, 3, 1))
        for ch, k, s in zip(self.channels, (8, 4, 3), (4, 2, 1)):
            x = nn.Conv(ch, (k, k), strides=(s, s), padding="VALID",
                        dtype=self.compute_dtype)(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.fc, dtype=self.compute_dtype)(x)
        x = nn.relu(x)
        return x.astype(jnp.float32)
