from .sharding import (  # noqa: F401
    default_mesh,
    make_batched_scale,
    make_row_sharded_scale,
    make_sharded_batch_step,
)
