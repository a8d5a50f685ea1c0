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
from hessian_llm_vision_tpu.parallel.seq_parallel import (
    seq_sharding,
    seq_parallel_config,
)
from hessian_llm_vision_tpu.parallel.param_sharding import (
    shard_params_for_tp,
    tp_spec_tree,
    DEFAULT_TP_RULES,
)
from hessian_llm_vision_tpu.parallel.probe_parallel import (
    probe_parallel_spectrum_host,
)
from hessian_llm_vision_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    make_pipelined_lm_loss,
    pipeline_apply,
    pipeline_param_sharding,
    stack_pipeline_params,
    unstack_pipeline_params,
)

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
    "shard_params_for_tp",
    "tp_spec_tree",
    "DEFAULT_TP_RULES",
    "seq_sharding",
    "seq_parallel_config",
    "probe_parallel_spectrum_host",
    "make_pipeline_mesh",
    "make_pipelined_lm_loss",
    "pipeline_apply",
    "pipeline_param_sharding",
    "stack_pipeline_params",
    "unstack_pipeline_params",
]
