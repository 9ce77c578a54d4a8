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

    Input: (B, F, H, W) stacked uint8 frames or — with
    `channels_last` — (B, H, W, F) already conv-ready (the learner's
    NHWC union gather emits this directly, skipping the whole-batch
    relayout copy the r4 profile charged at 12.5% of device time).
    Frames are normalized to [0, 1] on device (keeps the host->device
    stream uint8: 4x less HBM traffic than shipping f32).

    `space_to_depth`: rewrite conv_0 (8x8 stride 4 on C channels) as
    an EXACT equivalent 2x2 stride 1 conv on 4x4-patched input with
    16*C channels — the same contraction (8*8*C = 2*2*16*C per output
    pixel, so lecun_normal fan-in and the function class are
    unchanged) but with a dense channel axis the MXU can tile,
    instead of a 4-channel im2col (the r4 profile put conv_0 fwd+bwd
    at ~29% of device time). Standard public trick (e.g. JAX MuZero /
    EfficientZero Atari pipelines). Param shapes change
    ((2,2,16C,32) vs (8,8,C,32)), so it is a config option, not a
    checkpoint-compatible toggle.
    """
    channels: Sequence[int] = (32, 64, 64)
    fc: int = 512
    compute_dtype: Any = jnp.bfloat16
    channels_last: bool = False
    space_to_depth: bool = False

    @nn.compact
    def __call__(self, x):
        if x.ndim == 4 and not self.channels_last:
            # (B, F, H, W) -> NHWC with frames as channels (layout ops
            # run on the raw uint8 bytes, before the f32/bf16 cast).
            x = jnp.transpose(x, (0, 2, 3, 1))
        kernels, strides = (8, 4, 3), (4, 2, 1)
        if self.space_to_depth:
            b, h, w, c = x.shape
            r = strides[0]
            assert h % r == 0 and w % r == 0, (
                "space_to_depth needs H, W divisible by conv_0 stride")
            x = x.reshape(b, h // r, r, w // r, r, c)
            x = x.transpose(0, 1, 3, 2, 4, 5)
            x = x.reshape(b, h // r, w // r, r * r * c)
            kernels = (kernels[0] // r,) + kernels[1:]
            strides = (1,) + strides[1:]
        if x.dtype == jnp.uint8:
            x = x.astype(self.compute_dtype) / 255.0
        else:
            x = x.astype(self.compute_dtype)
        for ch, k, s in zip(self.channels, kernels, strides):
            x = nn.Conv(ch, (k, k), strides=(s, s), padding="VALID",
                        dtype=self.compute_dtype)(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.fc, dtype=self.compute_dtype)(x)
        x = nn.relu(x)
        return x.astype(jnp.float32)
