from rltime_tpu.envs.native.bindings import (  # noqa: F401
    NativeCartPoleVecEnv, build_library, library_path,
)
