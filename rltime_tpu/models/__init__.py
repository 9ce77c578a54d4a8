from rltime_tpu.models.policy import (  # noqa: F401
    ModelConfig, QPolicy, make_model, initial_rnn_state,
)
