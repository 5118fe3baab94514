from .mesh import (batch_sharding, create_mesh, replicate_tree, replicated,
                   shard_batch, DATA_AXIS, MODEL_AXIS)
from .fsdp import (fsdp_spec, fsdp_shardings, fsdp_shard_state,
                   sharded_param_bytes)

__all__ = ["batch_sharding", "create_mesh", "replicate_tree", "replicated",
           "shard_batch", "DATA_AXIS", "MODEL_AXIS",
           "fsdp_spec", "fsdp_shardings", "fsdp_shard_state",
           "sharded_param_bytes"]
