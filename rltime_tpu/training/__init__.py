from rltime_tpu.training.learner import (  # noqa: F401
    AlgoConfig, TrainState, make_train_state, make_update_step,
)
