"""PRNG key discipline.

Every stochastic component (exploration, PER sampling, IQN tau draws,
init) consumes explicitly-threaded `jax.random` keys — the precondition
for the exact-numerics parity bar (SURVEY.md §0 item 7). No component
ever calls a global RNG.
"""
from __future__ import annotations

import hashlib

import jax


def split_key(key, n: int = 2):
    """`jax.random.split` wrapper (single point of control)."""
    return jax.random.split(key, n)


def fold_in_str(key, name: str):
    """Deterministically derive a named subkey (stable across runs)."""
    digest = hashlib.sha256(name.encode()).digest()
    tag = int.from_bytes(digest[:4], "little")
    return jax.random.fold_in(key, tag)
