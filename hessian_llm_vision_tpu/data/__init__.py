from hessian_llm_vision_tpu.data.synthetic import (
    make_spirals,
    random_token_batches,
    random_image_batches,
    markov_token_batches,
)
from hessian_llm_vision_tpu.data.vision import (
    load_mnist,
    load_mnist_as_cifar,
    load_cifar10,
    get_class_subset,
    add_gaussian_noise,
    augment_batch,
)
from hessian_llm_vision_tpu.data.text import (
    load_lm_dataset,
    load_local_corpus,
    collate_tokens,
    stack_batches,
)

__all__ = [
    "make_spirals",
    "random_token_batches",
    "markov_token_batches",
    "random_image_batches",
    "load_mnist",
    "load_mnist_as_cifar",
    "load_cifar10",
    "get_class_subset",
    "add_gaussian_noise",
    "augment_batch",
    "load_lm_dataset",
    "load_local_corpus",
    "collate_tokens",
    "stack_batches",
]
