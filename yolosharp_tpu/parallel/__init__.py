from .mesh import (batch_sharding, create_mesh, replicate_tree, replicated,
                   shard_batch, DATA_AXIS, MODEL_AXIS)

__all__ = ["batch_sharding", "create_mesh", "replicate_tree", "replicated",
           "shard_batch", "DATA_AXIS", "MODEL_AXIS"]
