"""Best-checkpoint tracking rules (round-3 advisor findings):

* maybe_record_best keeps exactly ONE best-only snapshot: a new best
  deletes the previously marked dir unless it is an interval/final
  checkpoint (protected) — long improving runs don't accumulate
  permanent snapshots;
* a resumed trainer seeds its best score from best.json, so the first
  post-restart log interval cannot overwrite the pre-crash best with a
  worse mean.
"""
import json
import os

from rltime_tpu.training import checkpoint as ckpt_lib
from rltime_tpu.training.trainer import Trainer

from tests.test_integration import _tiny_cfg


def _fake_save(result_dir, step):
    d = os.path.join(result_dir, "checkpoints", str(step))
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "payload"), "w") as f:
        f.write("x")


def _exists(result_dir, step):
    return os.path.isdir(os.path.join(result_dir, "checkpoints",
                                      str(step)))


def test_single_best_snapshot_retained(tmp_path):
    d = str(tmp_path)
    best = float("-inf")
    # not enough episodes -> no-op
    best = ckpt_lib.maybe_record_best(d, best, 10.0, 2, 5, 100,
                                      lambda: _fake_save(d, 100))
    assert best == float("-inf") and ckpt_lib.best_step(d) is None
    # first best at step 100
    best = ckpt_lib.maybe_record_best(d, best, 10.0, 8, 5, 100,
                                      lambda: _fake_save(d, 100))
    assert best == 10.0
    assert ckpt_lib.best_step(d)["step"] == 100
    # worse mean -> unchanged, dir kept
    best = ckpt_lib.maybe_record_best(d, best, 9.0, 8, 5, 150,
                                      lambda: _fake_save(d, 150))
    assert best == 10.0 and _exists(d, 100) and not _exists(d, 150)
    # new best at 200 reclaims the best-only dir at 100
    best = ckpt_lib.maybe_record_best(d, best, 12.0, 8, 5, 200,
                                      lambda: _fake_save(d, 200))
    assert best == 12.0
    assert ckpt_lib.best_step(d)["step"] == 200
    assert not _exists(d, 100) and _exists(d, 200)


def test_protected_interval_checkpoint_survives(tmp_path):
    d = str(tmp_path)
    protected = {300}
    _fake_save(d, 300)  # pretend 300 is an interval checkpoint
    best = ckpt_lib.maybe_record_best(
        d, float("-inf"), 5.0, 8, 5, 300,
        lambda: _fake_save(d, 300), protected)
    assert not ckpt_lib.best_step(d)["best_only"]
    # newer best must NOT delete the interval checkpoint at 300
    best = ckpt_lib.maybe_record_best(
        d, best, 6.0, 8, 5, 400, lambda: _fake_save(d, 400), protected)
    assert best == 6.0 and _exists(d, 300) and _exists(d, 400)


def test_resume_seeds_best_score(tmp_path):
    d = str(tmp_path / "run")
    cfg = _tiny_cfg()
    cfg["train"]["log_interval"] = 100
    t1 = Trainer(cfg, d).train()
    rec = ckpt_lib.best_step(d)
    assert rec is not None  # counting_env episodes complete fast
    assert t1._best_score == rec["score"]
    cfg2 = _tiny_cfg()
    cfg2["train"]["resume"] = True
    t2 = Trainer(cfg2, d)
    assert t2._best_score == rec["score"]
    # and a worse post-resume mean does not rewrite best.json
    t2._maybe_save_best(rec["score"] - 1.0, 10)
    assert json.load(open(os.path.join(
        d, "checkpoints", "best.json"))) == rec


def test_interval_save_at_best_step_clears_best_only(tmp_path):
    """A best_only step later saved as an interval checkpoint must
    survive post-resume GC: unmark_best_only clears the flag, and
    derive_protected_steps then protects it (r5 review finding)."""
    d = str(tmp_path / "run")
    os.makedirs(os.path.join(d, "checkpoints", "500"))
    ckpt_lib.record_best(d, 500, 7.0, best_only=True)
    # resume-time reconstruction WITHOUT the fix would skip 500
    assert ckpt_lib.derive_protected_steps(d) == set()
    # ...the interval save at the same step upgrades it
    ckpt_lib.unmark_best_only(d, 500)
    rec = ckpt_lib.best_step(d)
    assert rec["step"] == 500 and not rec["best_only"]
    assert rec["score"] == 7.0
    assert ckpt_lib.derive_protected_steps(d) == {500}
    # unmark at a DIFFERENT step is a no-op
    ckpt_lib.record_best(d, 600, 8.0, best_only=True)
    os.makedirs(os.path.join(d, "checkpoints", "600"))
    ckpt_lib.unmark_best_only(d, 700)
    assert ckpt_lib.best_step(d)["best_only"]
    assert ckpt_lib.derive_protected_steps(d) == {500}
