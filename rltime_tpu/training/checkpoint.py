"""Checkpoint/resume (SURVEY.md §5.4).

Orbax-backed checkpoints of {params, target params, opt state, PRNG
key, counters} plus host-side counters — enough for deterministic
resume (the fixed-seed parity bar). Replay contents are optionally
included (off by default, matching the reference's model-only
checkpoints).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from rltime_tpu.training.learner import TrainState


def save(result_dir: str, step: int, train_state: TrainState,
         host_state: Dict[str, Any], replay_state=None):
    path = os.path.abspath(os.path.join(result_dir, "checkpoints",
                                        str(step)))
    ckpt = {
        "train_state": train_state,
        "host_state": host_state,
    }
    if replay_state is not None:
        ckpt["replay_state"] = replay_state
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, ckpt, force=True)
    return path


def latest_step(result_dir: str) -> Optional[int]:
    d = os.path.join(result_dir, "checkpoints")
    if not os.path.isdir(d):
        return None
    steps = [int(x) for x in os.listdir(d) if x.isdigit()]
    return max(steps) if steps else None


def restore(result_dir: str, step: Optional[int] = None,
            example: Optional[dict] = None) -> Dict[str, Any]:
    if step is None:
        step = latest_step(result_dir)
        if step is None:
            raise FileNotFoundError(
                f"no checkpoints under {result_dir!r}")
    path = os.path.abspath(os.path.join(result_dir, "checkpoints",
                                        str(step)))
    with ocp.PyTreeCheckpointer() as ckptr:
        if example is not None:
            restored = ckptr.restore(
                path, args=ocp.args.PyTreeRestore(
                    item=example,
                    restore_args=jax.tree.map(
                        lambda _: ocp.RestoreArgs(), example)))
        else:
            restored = ckptr.restore(path)
    restored["step"] = step
    return restored
