"""Parallelism layer: device mesh + GSPMD partition specs."""

from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    auto_mesh,
    data_sharding,
    effective_platform_devices,
    make_mesh,
    replicated,
)
from .sharding import (
    param_specs,
    shard_batch,
    shard_decode_inputs,
    shard_opt_state,
    shard_params,
)
from .multihost import host_local_batch_slice, initialize_multihost

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "auto_mesh",
    "effective_platform_devices",
    "make_mesh",
    "replicated",
    "data_sharding",
    "param_specs",
    "shard_params",
    "shard_batch",
    "shard_decode_inputs",
    "shard_opt_state",
    "initialize_multihost",
    "host_local_batch_slice",
]
