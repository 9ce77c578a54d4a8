"""ctypes bindings for the C++ batched stepper (SURVEY.md §2a).

The shared library auto-builds on first use (g++ -O3, ~1s) into
native/_build/. pybind11 is not in the image, so the ABI is plain C
and the arrays are preallocated numpy buffers passed by pointer —
zero copies on the step path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from rltime_tpu.config.registry import register
from rltime_tpu.envs.base import VecEnv, EnvSpec

_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD_DIR = os.path.join(_DIR, "_build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libstepper.so")
_LOCK = threading.Lock()
_LIB = None


def library_path() -> str:
    return _LIB_PATH


def _ale_flags():
    """Compile flags for the REAL ALE lane when headers are present
    (SURVEY.md §2a: ale-py not in this image; when it is, its bundled
    ale_interface.hpp + shared lib make the native lane a drop-in).

    ale-py wheels ship the C++ core either as libale*.so or folded
    into the Python extension (_ale_py*.so); link whichever shared
    object the installed wheel actually contains (advisor r4: a bare
    -lale was unverified against real wheels). Untestable in-sandbox
    (no ale_py); CI syntax-checks the lane against
    tests/fake_ale_include instead."""
    import glob
    try:
        import ale_py
        inc = os.path.join(os.path.dirname(ale_py.__file__), "include")
        if os.path.exists(os.path.join(inc, "ale_interface.hpp")):
            lib_dir = os.path.dirname(ale_py.__file__)
            sos = (glob.glob(os.path.join(lib_dir, "libale*.so*"))
                   or glob.glob(os.path.join(lib_dir, "_ale_py*.so"))
                   or glob.glob(os.path.join(lib_dir, "**", "libale*.so*"),
                                recursive=True))
            if not sos:
                import warnings
                warnings.warn(
                    "ale_py headers found but no libale*/_ale_py* "
                    f"shared object under {lib_dir} — the native "
                    "Atari lane will fall back to SYNTHETIC load-"
                    "generator lanes (scores are meaningless). Use "
                    "env.type='atari' (Python ALE) or point the "
                    "build at the ALE library.", stacklevel=2)
                return []
            return ["-DRLTIME_HAVE_ALE", f"-I{inc}",
                    f"-L{lib_dir}",
                    f"-l:{os.path.basename(sos[0])}",
                    f"-Wl,-rpath,{lib_dir}"]
    except ImportError:
        pass
    return []


def _resolve_rom(rom: str) -> str:
    """Game name -> ROM file path for the real-ALE lane.

    ALEInterface::loadROM expects a .bin path, not a game name
    (advisor r4). Pass-through for existing paths; otherwise resolve
    through ale_py.roms (new get_rom_path API, then the legacy
    attribute style). Synthetic lanes ignore the string entirely."""
    if os.path.exists(rom) or atari_backend() != "ale":
        return rom
    try:
        from ale_py import roms
        if hasattr(roms, "get_rom_path"):
            p = roms.get_rom_path(rom)
            if p:
                return str(p)
        name = "".join(w.capitalize() for w in rom.split("_"))
        if hasattr(roms, name):
            return str(getattr(roms, name))
    except ImportError:
        pass
    raise FileNotFoundError(
        f"cannot resolve Atari ROM {rom!r}: not a file and ale_py.roms"
        " has no entry for it")


def build_library(force: bool = False, tsan: bool = False) -> str:
    """Build the stepper .so; tsan=True builds a ThreadSanitizer
    variant (SURVEY.md §5.2: the host-side lane pool is the only
    first-party threaded code — its races are checked here, not at the
    XLA level where execution is single-logical-thread per device)."""
    src = os.path.join(_DIR, "stepper.cpp")
    out = (_LIB_PATH.replace(".so", "_tsan.so") if tsan else _LIB_PATH)
    with _LOCK:
        if force or (not os.path.exists(out)
                     or os.path.getmtime(out)
                     < os.path.getmtime(src)):
            os.makedirs(_BUILD_DIR, exist_ok=True)
            cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                   "-std=c++17", "-pthread"]
            if tsan:
                cmd += ["-fsanitize=thread", "-g"]
            cmd += [src, "-o", out] + _ale_flags()
            subprocess.run(cmd, check=True, capture_output=True)
    return out


def _load():
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(build_library())
        lib.cartpole_create.restype = ctypes.c_void_p
        lib.cartpole_create.argtypes = [ctypes.c_int32, ctypes.c_uint64,
                                        ctypes.c_int32, ctypes.c_int32]
        lib.cartpole_destroy.argtypes = [ctypes.c_void_p]
        lib.cartpole_reset.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                       ctypes.c_void_p]
        lib.cartpole_step.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 5
        lib.cartpole_step_many.argtypes = ([ctypes.c_void_p,
                                            ctypes.c_int32]
                                           + [ctypes.c_void_p] * 5)
        lib.atari_backend.restype = ctypes.c_int32
        lib.atari_create.restype = ctypes.c_void_p
        lib.atari_create.argtypes = [
            ctypes.c_int32, ctypes.c_uint64, ctypes.c_int32,
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int64]
        lib.atari_destroy.argtypes = [ctypes.c_void_p]
        lib.atari_num_actions.restype = ctypes.c_int32
        lib.atari_num_actions.argtypes = [ctypes.c_void_p]
        lib.atari_reset.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.atari_step.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 6
        _LIB = lib
    return _LIB


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


@register("cartpole_native")
class NativeCartPoleVecEnv(VecEnv):
    """C++ lane-pool CartPole: VecEnv-identical semantics to
    envs/cartpole.py (init-state RNG differs — std::mt19937 vs numpy
    PCG — so trajectories are same-distribution, not bit-equal)."""

    def __init__(self, num_envs: int, seed: int = 0,
                 num_threads: int = 0, time_limit: int = 500):
        lib = _load()
        self.num_envs = num_envs
        self.spec = EnvSpec(obs_shape=(4,), obs_dtype=np.float32,
                            num_actions=2)
        if num_threads <= 0:
            # The lockstep barrier costs ~µs per step: only shard
            # across threads when each shard has real work (cheap
            # envs need >=1024 lanes per thread to amortize; emulator
            # lanes like ALE amortize at ~8).
            num_threads = max(1, min(os.cpu_count() or 1,
                                     num_envs // 1024))
        self._h = lib.cartpole_create(num_envs, seed, num_threads,
                                      time_limit)
        self._lib = lib
        E = num_envs
        self._obs = np.empty((E, 4), np.float32)
        self._rew = np.empty((E,), np.float32)
        self._term = np.empty((E,), np.uint8)
        self._trunc = np.empty((E,), np.uint8)

    def reset(self, seed: int = 0) -> np.ndarray:
        self._lib.cartpole_reset(self._h, seed, _ptr(self._obs))
        return self._obs.copy()

    def step(self, actions: np.ndarray):
        a = np.ascontiguousarray(actions, np.int32)
        self._lib.cartpole_step(self._h, _ptr(a), _ptr(self._obs),
                                _ptr(self._rew), _ptr(self._term),
                                _ptr(self._trunc))
        return (self._obs.copy(), self._rew.copy(),
                self._term.astype(bool), self._trunc.astype(bool))

    def step_many(self, actions: np.ndarray):
        """(steps, E) actions -> stacked outputs; one C call per chunk."""
        S, E = actions.shape
        a = np.ascontiguousarray(actions, np.int32)
        obs = np.empty((S, E, 4), np.float32)
        rew = np.empty((S, E), np.float32)
        term = np.empty((S, E), np.uint8)
        trunc = np.empty((S, E), np.uint8)
        self._lib.cartpole_step_many(self._h, S, _ptr(a), _ptr(obs),
                                     _ptr(rew), _ptr(term), _ptr(trunc))
        return obs, rew, term.astype(bool), trunc.astype(bool)

    def close(self):
        if getattr(self, "_h", None):
            self._lib.cartpole_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def atari_backend() -> str:
    """'ale' when the .so was compiled against real ALE headers
    (RLTIME_HAVE_ALE), else 'synthetic'."""
    return "ale" if _load().atari_backend() else "synthetic"


@register("atari_native")
class NativeAtariVecEnv(VecEnv):
    """C++ Atari-shaped lane pool (stepper.cpp AtariPool).

    With ALE headers at build time this drives REAL emulators through
    the native DeepMind stack (noop/fire reset, frameskip max-pool,
    EpisodicLife, truncation — mirroring envs/atari.py:_AtariLane;
    grayscale/resize is an integer area resample, not cv2 INTER_AREA,
    so frames are wrapper-equivalent, not cv2-bit-equal). Without
    headers (this sandbox) the lanes are synthetic load generators
    with the same 84x84 output contract and per-step screen traffic —
    the engine-throughput proof harness (SURVEY.md §7 hard part 3)."""

    def __init__(self, num_envs: int, rom: str = "pong", seed: int = 0,
                 num_threads: int = 0, noop_max: int = 30,
                 frameskip: int = 4, episodic_life: bool = True,
                 fire_reset: bool = True, clip_rewards: bool = True,
                 max_episode_frames: int = 108_000):
        lib = _load()
        self.num_envs = num_envs
        self.clip_rewards = clip_rewards
        if num_threads <= 0:
            # emulator-priced lanes amortize the lockstep barrier at
            # ~8 lanes/thread (cf. 1024 for the trivial CartPole lane)
            num_threads = max(1, min(os.cpu_count() or 1,
                                     num_envs // 8))
        self._h = lib.atari_create(
            num_envs, seed, num_threads, _resolve_rom(rom).encode(),
            noop_max,
            frameskip, int(episodic_life), int(fire_reset),
            max_episode_frames)
        self._lib = lib
        self.spec = EnvSpec((84, 84), np.uint8,
                            int(lib.atari_num_actions(self._h)))
        E = num_envs
        self._obs = np.empty((E, 84, 84), np.uint8)
        self._rew = np.empty((E,), np.float32)
        self._term = np.empty((E,), np.uint8)
        self._trunc = np.empty((E,), np.uint8)
        self._over = np.empty((E,), np.uint8)
        self._game_score = np.zeros((E,), np.float64)
        self.completed_scores: list = []

    def reset(self, seed: int = 0) -> np.ndarray:
        self._game_score[:] = 0.0
        self._lib.atari_reset(self._h, _ptr(self._obs))
        return self._obs.copy()

    def pop_completed_scores(self):
        s, self.completed_scores = self.completed_scores, []
        return s

    def step(self, actions: np.ndarray):
        a = np.ascontiguousarray(actions, np.int32)
        self._lib.atari_step(self._h, _ptr(a), _ptr(self._obs),
                             _ptr(self._rew), _ptr(self._term),
                             _ptr(self._trunc), _ptr(self._over))
        rew = self._rew.copy()
        self._game_score += rew
        for i in np.nonzero(self._over)[0]:
            self.completed_scores.append(float(self._game_score[i]))
            self._game_score[i] = 0.0
        if self.clip_rewards:
            rew = np.sign(rew).astype(np.float32)
        return (self._obs.copy(), rew, self._term.astype(bool),
                self._trunc.astype(bool))

    def close(self):
        if getattr(self, "_h", None):
            self._lib.atari_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
