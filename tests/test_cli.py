"""CLI-surface tests: eval entry + train_distributed trainer dispatch.

These drive the same code the user-facing commands run (SURVEY.md §1
L0), in-process on the conftest CPU mesh.
"""
import json
import os

import numpy as np
import pytest

from rltime_tpu.training.trainer import Trainer

from tests.test_integration import _tiny_cfg


def test_evaluate_function_reports_scores(tmp_path):
    d = str(tmp_path / "run")
    Trainer(_tiny_cfg(), d).train()
    from rltime_tpu.eval import evaluate
    rep = evaluate(d, episodes=3, max_steps=5000)
    assert rep["episodes"] == 3
    for k in ("return_mean", "return_median", "return_min",
              "return_max", "checkpoint_step"):
        assert k in rep
    assert np.isfinite(rep["return_mean"])
    # --best resolves through best.json when present
    from rltime_tpu.training import checkpoint as ckpt_lib
    if ckpt_lib.best_step(d) is not None:
        rep_b = evaluate(d, episodes=2, max_steps=5000, best=True)
        assert rep_b["checkpoint_step"] == ckpt_lib.best_step(d)["step"]


def test_train_distributed_dispatches_fused(tmp_path):
    """train_distributed with train.trainer=fused drives the flagship
    FusedApexTrainer (single-process degenerate case of the pod
    path)."""
    from rltime_tpu import train_distributed
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump({
            "seed": 0,
            "env": {"type": "cartpole_device", "num_envs": 2},
            "model": {"torso": "mlp", "mlp_hidden": [16],
                      "head": "linear"},
            "replay": {"steps_per_env": 64, "prioritized": True},
            "algo": {"algo": "dqn", "batch_size": 4, "n_step": 2,
                     "lr": 1e-3, "target_update_freq": 10},
            "train": {"total_env_steps": 2048,
                      "warmup_env_steps": 0, "chunk_len": 8,
                      "updates_per_chunk": 1,
                      "log_interval": 1024,
                      "checkpoint_interval": 10**9,
                      "trainer": "fused"},
        }, f)
    rd = str(tmp_path / "res")
    assert train_distributed.main([cfg_path, "--result-dir", rd]) == 0
    # the fused trainer logged scalars and wrote a final checkpoint
    lines = [json.loads(l) for l in
             open(os.path.join(rd, "scalars.jsonl"))]
    assert lines and lines[-1]["env_steps"] >= 2048
    assert os.path.isdir(os.path.join(rd, "checkpoints"))
    # sidecar layout exists (per-process actor/replay rows)
    aux = os.path.join(rd, "checkpoints_aux")
    steps = os.listdir(aux)
    assert steps and os.path.isdir(os.path.join(aux, steps[0],
                                                "proc0"))
