from rltime_tpu.history.replay import (  # noqa: F401
    ReplayConfig, ReplayState, replay_init, replay_insert,
    replay_sample_indices, replay_update_priorities, replay_gather_window,
    valid_range,
)
