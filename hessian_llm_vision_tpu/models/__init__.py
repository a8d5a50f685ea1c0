from hessian_llm_vision_tpu.models.attention import causal_attention
from hessian_llm_vision_tpu.models.mlp import SpiralMLP, SimpleNet
from hessian_llm_vision_tpu.models.gpt2 import GPT2Config, GPT2LMHead
from hessian_llm_vision_tpu.models.pythia import NeoXConfig, NeoXLMHead, PYTHIA_CONFIGS
from hessian_llm_vision_tpu.models.llama import LlamaConfig, LlamaLMHead, LLAMA_CONFIGS
from hessian_llm_vision_tpu.models.moe import (
    MoEMLP,
    make_ep_mesh,
    moe_param_sharding,
    shard_params_for_ep,
)
from hessian_llm_vision_tpu.models.vgg import VGG16
from hessian_llm_vision_tpu.models.resnet import ResNet50
from hessian_llm_vision_tpu.models import losses

__all__ = [
    "causal_attention",
    "SpiralMLP",
    "SimpleNet",
    "GPT2Config",
    "GPT2LMHead",
    "NeoXConfig",
    "NeoXLMHead",
    "PYTHIA_CONFIGS",
    "LlamaConfig",
    "LlamaLMHead",
    "LLAMA_CONFIGS",
    "VGG16",
    "ResNet50",
    "losses",
    "MoEMLP",
    "make_ep_mesh",
    "moe_param_sharding",
    "shard_params_for_ep",
]
