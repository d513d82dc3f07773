from mava_tpu.parallel.mesh import (
    DATA_AXIS,
    build_learner,
    make_mesh,
    num_learner_devices,
    replicate_sharding,
    shard_leading_axis,
)

__all__ = [
    "DATA_AXIS",
    "build_learner",
    "make_mesh",
    "num_learner_devices",
    "replicate_sharding",
    "shard_leading_axis",
]
