from .mesh import (
    make_mesh,
    make_mesh_2d,
    make_dp_train_step,
    make_dp_train_scan,
    make_dp_tp_train_step,
    make_dp_sp_train_step,
    make_dp_forward,
    make_fsdp_train_step,
    make_spatial_forward,
    make_zero1_train_step,
    shard_batch,
    shard_train_state,
    shard_zero_state,
    tp_param_specs,
    zero_param_specs,
    replicate,
)
from .pipeline import Pipeline, split_stages  # noqa: F401
