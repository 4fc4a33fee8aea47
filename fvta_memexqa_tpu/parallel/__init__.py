from fvta_memexqa_tpu.parallel.mesh import (
    batch_shardings,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = ["batch_shardings", "make_mesh", "replicated", "shard_batch"]
