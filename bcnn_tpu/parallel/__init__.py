from .mesh import (
    make_mesh,
    make_dp_train_step,
    make_dp_train_scan,
    make_dp_forward,
    make_spatial_forward,
    shard_batch,
    replicate,
)
