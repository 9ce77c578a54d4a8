"""QPolicy: torso + optional LSTM + Q head, with sequence unroll.

TPU-native re-design of the reference's model/policy layer (SURVEY.md
§1 L5: `forward(obs, state) -> (q/quantiles, state)` with recurrent
state bookkeeping). One flax module serves both the acting side and the
learner side — no separate "actor_policy" mirror; weight publication is
just handing the same param pytree to the acting step.

Sequence processing (R2D2) is a `lax.scan` over time on one device
(SURVEY.md §5.7: sequences are short and fixed; no sequence
parallelism by design — parity with the reference, which has none).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rltime_tpu.models.torso import (
    MLPTorso, MinAtarCNNTorso, NatureCNNTorso,
)
from rltime_tpu.models.heads import LinearQHead, DuelingQHead, IQNHead


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static model hyperparameters (hashable; safe as jit static arg)."""
    num_actions: int
    torso: str = "mlp"                  # "mlp" | "nature_cnn" | "minatar_cnn"
    mlp_hidden: Tuple[int, ...] = (64, 64)
    cnn_channels: Tuple[int, ...] = (32, 64, 64)
    cnn_fc: int = 512
    lstm_size: int = 0                  # 0 => feed-forward
    head: str = "linear"                # "linear" | "dueling" | "iqn"
    dueling_hidden: int = 256
    iqn_embed_dim: int = 64
    iqn_dueling: bool = False
    num_tau: int = 64                   # training prediction taus
    num_tau_prime: int = 64             # training target taus
    num_tau_policy: int = 32            # acting taus (risk-neutral mean)
    compute_dtype: str = "float32"      # "float32" | "bfloat16"
    # Nature-CNN perf options (see torso.NatureCNNTorso): NHWC obs
    # contract (4D model input is (B, H, W, F); the learner emits its
    # union gather channel-last, the actor transposes its tiny
    # per-step stack) and the exact conv_0 space-to-depth rewrite.
    channels_last: bool = False
    space_to_depth: bool = False

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    @property
    def is_iqn(self) -> bool:
        return self.head == "iqn"

    @property
    def recurrent(self) -> bool:
        return self.lstm_size > 0


class QPolicy(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        if ((c.channels_last or c.space_to_depth)
                and c.torso != "nature_cnn"):
            raise ValueError(
                "channels_last/space_to_depth are Nature-CNN options "
                f"(torso={c.torso!r})")
        if c.torso == "mlp":
            self.torso_mod = MLPTorso(hidden=c.mlp_hidden,
                                      compute_dtype=c.dtype)
        elif c.torso == "nature_cnn":
            self.torso_mod = NatureCNNTorso(
                channels=c.cnn_channels, fc=c.cnn_fc,
                compute_dtype=c.dtype,
                channels_last=c.channels_last,
                space_to_depth=c.space_to_depth)
        elif c.torso == "minatar_cnn":
            self.torso_mod = MinAtarCNNTorso(channels=c.cnn_channels,
                                             fc=c.cnn_fc,
                                             compute_dtype=c.dtype)
        else:
            raise ValueError(f"unknown torso {c.torso!r}")
        if c.recurrent:
            self.lstm = nn.OptimizedLSTMCell(c.lstm_size)
        if c.head == "linear":
            self.head_mod = LinearQHead(c.num_actions)
        elif c.head == "dueling":
            self.head_mod = DuelingQHead(c.num_actions,
                                         hidden=c.dueling_hidden,
                                         compute_dtype=c.dtype)
        elif c.head == "iqn":
            self.head_mod = IQNHead(c.num_actions,
                                    embed_dim=c.iqn_embed_dim,
                                    dueling=c.iqn_dueling,
                                    hidden=c.dueling_hidden,
                                    compute_dtype=c.dtype)
        else:
            raise ValueError(f"unknown head {c.head!r}")

    def __call__(self, obs, rnn_state=(), taus: Optional[jnp.ndarray] = None):
        """One step. obs (B, ...); rnn_state () or (c, h) each (B, H).

        Returns (q, new_rnn_state): q is (B, A), or (B, N, A) quantile
        values when the head is IQN (taus required, shape (B, N)).
        """
        feat = self.torso_mod(obs)
        if self.cfg.recurrent:
            rnn_state, feat = self.lstm(rnn_state, feat)
        if self.cfg.is_iqn:
            if taus is None:
                raise ValueError("IQN head requires taus")
            q = self.head_mod(feat, taus)
        else:
            q = self.head_mod(feat)
        return q, rnn_state


def make_model(cfg: ModelConfig) -> QPolicy:
    return QPolicy(cfg)


def initial_rnn_state(cfg: ModelConfig, batch: int):
    """Zero LSTM carry (c, h), or () for feed-forward policies."""
    if not cfg.recurrent:
        return ()
    # Distinct buffers: (z, z) would alias c and h, which breaks
    # donation (same buffer donated twice).
    return (jnp.zeros((batch, cfg.lstm_size), jnp.float32),
            jnp.zeros((batch, cfg.lstm_size), jnp.float32))


def init_params(cfg: ModelConfig, key, example_obs):
    model = make_model(cfg)
    state = initial_rnn_state(cfg, example_obs.shape[0])
    taus = (jnp.full((example_obs.shape[0], cfg.num_tau), 0.5)
            if cfg.is_iqn else None)
    return model.init(key, example_obs, state, taus)


def q_values(cfg: ModelConfig, quantiles_or_q: jnp.ndarray) -> jnp.ndarray:
    """Risk-neutral action values: mean over the tau axis for IQN."""
    if cfg.is_iqn:
        return jnp.mean(quantiles_or_q, axis=1)
    return quantiles_or_q


def unroll(model: QPolicy, params, obs_seq, done_prev_seq, rnn_state,
           taus_seq=None):
    """Unroll over time with per-step recurrent reset (SURVEY.md §3.2).

    Args:
      obs_seq: (B, T, ...) observations.
      done_prev_seq: (B, T) True where the PREVIOUS step ended an
        episode — the carry is zeroed before consuming that step,
        mirroring the acting side's reset bookkeeping.
      rnn_state: carry at t=0 ((c, h) or ()).
      taus_seq: (B, T, N) for IQN unrolls.

    Returns (q_seq (B, T, ...), final_state).
    """
    def step(carry, xs):
        if taus_seq is not None:
            obs, done_prev, taus = xs
        else:
            (obs, done_prev), taus = xs, None
        if isinstance(carry, tuple) and len(carry) > 0:
            mask = (1.0 - done_prev.astype(jnp.float32))[:, None]
            carry = jax.tree.map(lambda s: s * mask, carry)
        q, carry = model.apply(params, obs, carry, taus)
        return carry, q

    xs = (jnp.moveaxis(obs_seq, 0, 1), jnp.moveaxis(done_prev_seq, 0, 1))
    if taus_seq is not None:
        xs = xs + (jnp.moveaxis(taus_seq, 0, 1),)
    final_state, q_seq = jax.lax.scan(step, rnn_state, xs)
    return jnp.moveaxis(q_seq, 0, 1), final_state
