from .sharding import (
    make_mesh,
    shard_particles,
    replicate,
    pad_to_multiple,
    make_sharded_sim_step,
)

__all__ = [
    "make_mesh",
    "shard_particles",
    "replicate",
    "pad_to_multiple",
    "make_sharded_sim_step",
]
