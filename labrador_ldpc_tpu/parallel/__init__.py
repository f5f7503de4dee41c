from .mesh import (
    batch_sharding,
    make_batch_mesh,
    make_sharded_decoder,
    make_sharded_trial_step,
)

__all__ = [
    "make_batch_mesh",
    "batch_sharding",
    "make_sharded_decoder",
    "make_sharded_trial_step",
    # multi-host bootstrap + runner live in .launch (imported lazily: the
    # module calls jax.distributed.initialize, keep it opt-in)
]
