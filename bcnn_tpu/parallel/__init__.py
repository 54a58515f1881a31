from .mesh import (
    make_mesh,
    make_mesh_2d,
    make_dp_train_step,
    make_dp_train_scan,
    make_dp_tp_train_step,
    make_dp_sp_train_step,
    make_dp_forward,
    make_spatial_forward,
    shard_batch,
    shard_train_state,
    tp_param_specs,
    replicate,
)
from .pipeline import Pipeline, split_stages  # noqa: F401
