from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    initialize_distributed,
    make_mesh,
    pad_batch_to_multiple,
    param_pspecs,
    shard_batch,
    shard_params,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "initialize_distributed",
    "make_mesh",
    "pad_batch_to_multiple",
    "param_pspecs",
    "shard_batch",
    "shard_params",
]
