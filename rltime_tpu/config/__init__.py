from rltime_tpu.config.registry import register, lookup, registered_names  # noqa: F401
from rltime_tpu.config.config import load_config, apply_overrides, build  # noqa: F401
