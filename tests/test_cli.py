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


def test_native_atari_engine_full_loop(tmp_path):
    """End-to-end: C++ Atari-shaped lane pool -> host Actor (frame
    stack 4) -> uint8 replay ring -> CNN learner updates. The host
    image pipeline over the native engine (SURVEY.md §2a), synthetic
    lanes in-sandbox, identical machinery with real ALE."""
    cfg = {
        "seed": 0,
        "env": {"type": "atari_native", "num_envs": 4,
                "num_threads": 1},
        "frame_stack": 4,
        "model": {"torso": "nature_cnn", "cnn_channels": [4, 4, 4],
                  "cnn_fc": 16, "head": "dueling",
                  "dueling_hidden": 8},
        "replay": {"steps_per_env": 64, "prioritized": True},
        "algo": {"algo": "dqn", "batch_size": 4, "n_step": 3,
                 "lr": 1e-3, "target_update_freq": 10},
        "train": {"total_env_steps": 600, "warmup_env_steps": 200,
                  "chunk_len": 8, "updates_per_chunk": 1,
                  "log_interval": 10**9,
                  "checkpoint_interval": 10**9},
    }
    t = Trainer(cfg, str(tmp_path / "na")).train()
    assert t.updates_done > 0
    assert t.replay_state.storage["obs"].dtype.name == "uint8"
    assert int(np.asarray(t.replay_state.storage["obs"]).sum()) > 0
    scores = t.env.pop_completed_scores()
    assert isinstance(scores, list)
