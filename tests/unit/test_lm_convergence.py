"""End-to-end LM training convergence on learnable synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hessian_llm_vision_tpu.data import markov_token_batches
from hessian_llm_vision_tpu.models import GPT2Config, GPT2LMHead, losses
from hessian_llm_vision_tpu.train import make_train_step, train
import pytest


@pytest.mark.slow
def test_gpt2_learns_markov_data(key):
    cfg = GPT2Config.tiny(vocab_size=32)
    model = GPT2LMHead(cfg)
    params = model.init_params(key, seq_len=32)
    data = markov_token_batches(8, 8, 32, cfg.vocab_size, seed=0)
    batches = [
        {k: jnp.asarray(v[i]) for k, v in data.items()} for i in range(8)
    ]
    loss_fn = losses.lm_loss_fn(model)
    init_fn, step_fn = make_train_step(loss_fn, optax.adam(3e-3))
    logs = []
    train(step_fn, init_fn(params), batches, num_epochs=6, log_every=1,
          on_log=lambda s, m: logs.append(m["loss"]))
    # uniform would floor at ln(32)=3.47; Markov structure is learnable
    assert logs[0] > 3.0
    assert logs[-1] < logs[0] - 0.5, f"no learning: {logs[0]:.3f}->{logs[-1]:.3f}"
