from hessian_llm_vision_tpu.utils.flatten import Flattener, tree_size
from hessian_llm_vision_tpu.utils.trees import (
    param_labels,
    subtree_mask,
    tree_dot,
    tree_norm,
    tree_axpy,
)

__all__ = [
    "Flattener",
    "tree_size",
    "param_labels",
    "subtree_mask",
    "tree_dot",
    "tree_norm",
    "tree_axpy",
]
