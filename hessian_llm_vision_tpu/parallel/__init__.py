from hessian_llm_vision_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicated_sharding,
    basis_sharding,
    shard_batch,
)
from hessian_llm_vision_tpu.parallel.hvp_sharded import (
    ShardedHessianOperator,
    sharded_grad_fn,
)
from hessian_llm_vision_tpu.parallel.offload import to_host, to_device

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "basis_sharding",
    "shard_batch",
    "ShardedHessianOperator",
    "sharded_grad_fn",
    "to_host",
    "to_device",
]
