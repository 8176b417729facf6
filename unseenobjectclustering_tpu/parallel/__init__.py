"""Device-mesh construction and sharding for data-parallel training.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(tools/train_net.py:124-127).  Here the TPU-native equivalent is a 1-D
``jax.sharding.Mesh`` over all chips with the batch axis sharded; XLA compiles
the gradient all-reduce onto ICI (SURVEY.md §2.6).
"""

from unseenobjectclustering_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated_sharding, shard_batch, replicate)

__all__ = [
    "make_mesh", "batch_sharding", "replicated_sharding", "shard_batch",
    "replicate",
]
