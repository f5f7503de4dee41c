from .mesh import (
    batch_sharding,
    make_batch_mesh,
    make_sharded_decoder,
    make_sharded_trial_step,
)

__all__ = ["make_batch_mesh", "batch_sharding", "make_sharded_decoder", "make_sharded_trial_step"]
