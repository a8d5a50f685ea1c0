from hessian_llm_vision_tpu.train.loop import (
    EpochResampledBatches,
    TrainState,
    make_train_step,
    train,
)
from hessian_llm_vision_tpu.train.evaluation import (
    evaluate_accuracy,
    evaluate_loss,
    per_batch_losses,
)
from hessian_llm_vision_tpu.train.accumulate import to_microbatches

__all__ = [
    "TrainState",
    "make_train_step",
    "train",
    "evaluate_accuracy",
    "evaluate_loss",
    "per_batch_losses",
    "to_microbatches",
]
