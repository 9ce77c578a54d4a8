from rltime_tpu.envs.base import VecEnv, EnvSpec  # noqa: F401
from rltime_tpu.envs.cartpole import CartPoleVecEnv  # noqa: F401
from rltime_tpu.envs.fake import CountingVecEnv  # noqa: F401
from rltime_tpu.envs import gym_vec  # noqa: F401  (registers gym envs)
from rltime_tpu.envs import atari  # noqa: F401  (registers if ale_py present)
from rltime_tpu.envs import device  # noqa: F401  (registers device envs)
from rltime_tpu.envs import minatar  # noqa: F401  (registers minatar envs)
try:
    from rltime_tpu.envs import native  # noqa: F401  (registers if g++ present)
except Exception:  # pragma: no cover - no toolchain
    pass
