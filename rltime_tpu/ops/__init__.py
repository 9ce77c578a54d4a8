from rltime_tpu.ops import sum_tree, returns, losses  # noqa: F401
