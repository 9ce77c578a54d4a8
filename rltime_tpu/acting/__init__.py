from rltime_tpu.acting.actor import Actor, ActorDeviceState, make_act_step  # noqa: F401
