"""C++ batched stepper tests: build, semantics vs numpy engine."""
import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no g++ toolchain")


def test_build_and_basic_step():
    from rltime_tpu.envs.native import NativeCartPoleVecEnv
    env = NativeCartPoleVecEnv(16, seed=0, num_threads=1)
    obs = env.reset(0)
    assert obs.shape == (16, 4) and obs.dtype == np.float32
    assert np.all(np.abs(obs) <= 0.05)
    o, r, tm, tr = env.step(np.ones(16, np.int32))
    assert o.shape == (16, 4)
    np.testing.assert_allclose(r, 1.0)
    assert tm.dtype == bool and tr.dtype == bool
    env.close()


def test_dynamics_match_numpy_engine():
    """Same action sequence from a forced common state: the C++ lane
    must integrate identically to the numpy engine (same Euler math).
    We align states by resetting both to near-zero and comparing the
    deterministic part of the trajectory statistically."""
    from rltime_tpu.envs.cartpole import CartPoleVecEnv
    from rltime_tpu.envs.native import NativeCartPoleVecEnv
    E, S = 256, 300
    rng = np.random.default_rng(0)
    acts = rng.integers(0, 2, (S, E)).astype(np.int32)

    nat = NativeCartPoleVecEnv(E, seed=0, num_threads=1)
    ref = CartPoleVecEnv(E, seed=0)
    nat.reset(0)
    ref.reset(0)
    # Trajectories diverge per-lane (different init RNG), but the
    # dynamics must produce the same episode-length distribution under
    # the same random policy.
    lens_n, lens_r = [], []
    steps_n = np.zeros(E)
    steps_r = np.zeros(E)
    for t in range(S):
        _, _, tm, tr = nat.step(acts[t])
        d = tm | tr
        steps_n += 1
        lens_n.extend(steps_n[d].tolist())
        steps_n[d] = 0
        _, _, tm2, tr2 = ref.step(acts[t])
        d2 = tm2 | tr2
        steps_r += 1
        lens_r.extend(steps_r[d2].tolist())
        steps_r[d2] = 0
    assert len(lens_n) > 100 and len(lens_r) > 100
    m_n, m_r = np.mean(lens_n), np.mean(lens_r)
    assert abs(m_n - m_r) / m_r < 0.15, (m_n, m_r)


def test_step_many_matches_stepwise():
    from rltime_tpu.envs.native import NativeCartPoleVecEnv
    E, S = 32, 50
    rng = np.random.default_rng(1)
    acts = rng.integers(0, 2, (S, E)).astype(np.int32)
    a = NativeCartPoleVecEnv(E, seed=3, num_threads=1)
    b = NativeCartPoleVecEnv(E, seed=3, num_threads=1)
    a.reset(7)
    b.reset(7)
    obs_m, rew_m, term_m, trunc_m = a.step_many(acts)
    for t in range(S):
        o, r, tm, tr = b.step(acts[t])
        np.testing.assert_array_equal(obs_m[t], o)
        np.testing.assert_array_equal(term_m[t], tm)


def test_registry_buildable():
    from rltime_tpu.config.config import build
    import rltime_tpu.envs  # noqa: F401
    import rltime_tpu.envs.native  # noqa: F401  (registers)
    env = build({"type": "cartpole_native", "num_envs": 4})
    env.reset(0)
    env.close()


def test_tsan_build_clean():
    """ThreadSanitizer build of the lane pool steps cleanly
    (SURVEY.md §5.2). Runs the threaded step path under TSan in a
    subprocess; any reported race fails via non-zero exit."""
    import ctypes
    import subprocess
    import sys
    from rltime_tpu.envs.native.bindings import build_library
    lib = build_library(tsan=True)
    code = f"""
import ctypes, numpy as np
lib = ctypes.CDLL({lib!r})
lib.cartpole_create.restype = ctypes.c_void_p
lib.cartpole_create.argtypes = [ctypes.c_int32, ctypes.c_uint64,
                                ctypes.c_int32, ctypes.c_int32]
h = lib.cartpole_create(256, 0, 2, 500)
E = 256
obs = np.empty((E,4), np.float32); rew = np.empty(E, np.float32)
term = np.empty(E, np.uint8); trunc = np.empty(E, np.uint8)
a = np.random.randint(0,2,E).astype(np.int32)
p = lambda x: x.ctypes.data_as(ctypes.c_void_p)
for _ in range(200):
    lib.cartpole_step(ctypes.c_void_p(h), p(a), p(obs), p(rew),
                      p(term), p(trunc))
lib.cartpole_destroy(ctypes.c_void_p(h))
print("tsan run done")
"""
    import glob
    tsan_so = (glob.glob("/lib/x86_64-linux-gnu/libtsan.so.*")
               + glob.glob("/usr/lib/x86_64-linux-gnu/libtsan.so.*"))
    if not tsan_so:
        pytest.skip("libtsan runtime not found")
    # LD_PRELOAD: tsan cannot be dlopen'd late (static TLS exhaustion)
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True,
                       env={"TSAN_OPTIONS": "exitcode=66",
                            "LD_PRELOAD": tsan_so[0],
                            "PATH": "/usr/bin:/bin"})
    assert "tsan run done" in r.stdout, r.stderr[-2000:]
    assert r.returncode == 0, r.stderr[-2000:]


def test_atari_lane_synthetic_backend():
    """Atari-shaped native lanes (SURVEY.md §2a / §7 hard part 3):
    84x84 uint8 frames, deterministic under seed, episodic-life
    boundaries firing, true-score pops at game-over."""
    from rltime_tpu.envs.native.bindings import (
        NativeAtariVecEnv, atari_backend)
    assert atari_backend() in ("ale", "synthetic")
    env = NativeAtariVecEnv(num_envs=4, seed=7, num_threads=2)
    obs = env.reset()
    assert obs.shape == (4, 84, 84) and obs.dtype == np.uint8
    assert env.spec.num_actions >= 3
    rng = np.random.default_rng(0)
    terms = overs = 0
    for _ in range(400):
        a = rng.integers(0, env.spec.num_actions, 4).astype(np.int32)
        o, r, tm, tr = env.step(a)
        assert o.shape == (4, 84, 84)
        assert set(np.unique(r)) <= {-1.0, 0.0, 1.0}  # clipped
        terms += int(tm.sum())
    assert int((obs > 0).sum()) > 0
    assert terms > 0                      # life-loss boundaries fired
    assert len(env.pop_completed_scores()) > 0   # games completed
    env.close()
    # determinism: same seed, single-threaded replay of the same
    # actions gives identical frames
    e1 = NativeAtariVecEnv(num_envs=2, seed=3, num_threads=1)
    e2 = NativeAtariVecEnv(num_envs=2, seed=3, num_threads=2)
    o1, o2 = e1.reset(), e2.reset()
    np.testing.assert_array_equal(o1, o2)
    for _ in range(20):
        a = np.zeros(2, np.int32)
        o1 = e1.step(a)[0]
        o2 = e2.step(a)[0]
    np.testing.assert_array_equal(o1, o2)
    e1.close()
    e2.close()


def test_atari_lane_real_ale_compiles():
    """The real-ALE lane must COMPILE (drop-in promise): syntax-check
    stepper.cpp with -DRLTIME_HAVE_ALE against a minimal mirror of the
    public ALE C++ API (tests/fake_ale_include). Running it needs
    ale-py + ROMs (absent in-sandbox, envs/atari.py gating)."""
    import os
    import subprocess
    from rltime_tpu.envs.native import bindings
    src = os.path.join(os.path.dirname(bindings.__file__),
                       "stepper.cpp")
    inc = os.path.join(os.path.dirname(__file__), "fake_ale_include")
    r = subprocess.run(
        ["g++", "-fsyntax-only", "-std=c++17", "-DRLTIME_HAVE_ALE",
         f"-I{inc}", src], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
