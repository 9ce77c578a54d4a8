from rltime_tpu.exploration.epsilon import (  # noqa: F401
    EpsilonGreedy, epsilon_ladder,
)
