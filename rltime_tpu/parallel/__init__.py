from rltime_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, sharded_replay_init, make_sharded_update_step,
    make_sharded_insert, replay_partition_specs, shard_chunk,
)
