from rltime_tpu.utils.prng import split_key, fold_in_str  # noqa: F401
