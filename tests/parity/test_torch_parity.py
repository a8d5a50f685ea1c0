"""Forward parity vs HF torch implementations (random weights, offline).

The strongest architecture check available without network: build the HF
torch model from a config, convert its random state_dict through
models.convert, and require logit agreement — validating both the model
implementation and the converter (and thus the migration path for the
reference's checkpoints)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_gpt2_logits_match_hf(key):
    from transformers import GPT2Config as HFConfig
    from transformers import GPT2LMHeadModel

    from hessian_llm_vision_tpu.models.convert import gpt2_from_torch_state_dict
    from hessian_llm_vision_tpu.models.gpt2 import GPT2Config, GPT2LMHead

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=128,
        n_positions=32,
        n_embd=48,
        n_layer=2,
        n_head=4,
        resid_pdrop=0.0,
        embd_pdrop=0.0,
        attn_pdrop=0.0,
    )
    hf = GPT2LMHeadModel(hf_cfg).eval()

    cfg = GPT2Config(vocab_size=128, n_positions=32, n_embd=48, n_layer=2, n_head=4)
    params = gpt2_from_torch_state_dict(hf.state_dict(), cfg)
    model = GPT2LMHead(cfg)

    ids = np.random.RandomState(1).randint(0, 128, size=(2, 16))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    ours = np.asarray(model.apply({"params": params}, ids))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_neox_logits_match_hf(key):
    from transformers import GPTNeoXConfig as HFConfig
    from transformers import GPTNeoXForCausalLM

    from hessian_llm_vision_tpu.models.convert import neox_from_torch_state_dict
    from hessian_llm_vision_tpu.models.pythia import NeoXConfig, NeoXLMHead

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=128,
        max_position_embeddings=32,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=256,
        rotary_pct=0.25,
        hidden_act="gelu",
        hidden_dropout=0.0,
        attention_dropout=0.0,
        use_parallel_residual=True,
    )
    hf = GPTNeoXForCausalLM(hf_cfg).eval()

    cfg = NeoXConfig(
        vocab_size=128,
        max_position_embeddings=32,
        hidden_size=64,
        num_layers=2,
        num_heads=4,
        rotary_pct=0.25,
    )
    params = neox_from_torch_state_dict(hf.state_dict(), cfg)
    model = NeoXLMHead(cfg)

    ids = np.random.RandomState(1).randint(0, 128, size=(2, 16))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    ours = np.asarray(model.apply({"params": params}, ids))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_llama_logits_match_hf(key):
    """Tiny LLaMA with GQA: logits vs HF LlamaForCausalLM on converted
    random weights (validates RMSNorm, SwiGLU, full-dim rotary, GQA
    repeat, untied head, and the converter)."""
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM

    from hessian_llm_vision_tpu.models.convert import llama_from_torch_state_dict
    from hessian_llm_vision_tpu.models.llama import LlamaConfig, LlamaLMHead

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attention_dropout=0.0,
        attn_implementation="eager",
    )
    hf = LlamaForCausalLM(hf_cfg).eval()

    cfg = LlamaConfig.tiny(vocab_size=128)
    params = llama_from_torch_state_dict(hf.state_dict(), cfg)
    model = LlamaLMHead(cfg)

    ids = np.random.RandomState(1).randint(0, 128, size=(2, 16))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    ours = np.asarray(model.apply({"params": params}, ids))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_llama_lora_loss_eval(key):
    """The loss-llama.ipynb capability: LoRA adapters over LLaMA + the
    per-batch loss sweep (cells 0, 6-8)."""
    import jax

    from hessian_llm_vision_tpu.models.llama import LlamaConfig, LlamaLMHead
    from hessian_llm_vision_tpu.models.lora import lora_init, lora_loss_fn
    from hessian_llm_vision_tpu.models import losses
    from hessian_llm_vision_tpu.train.evaluation import per_batch_losses

    cfg = LlamaConfig.tiny()
    model = LlamaLMHead(cfg)
    params = model.init_params(jax.random.PRNGKey(0), seq_len=16)
    adapters = lora_init(params, rank=2, key=jax.random.PRNGKey(1))
    assert any("q_proj" in k for k in adapters)  # llama targets matched

    ids = np.random.RandomState(2).randint(0, cfg.vocab_size, (3, 4, 16))
    batches = [{"input_ids": ids[i]} for i in range(3)]
    loss_fn = losses.lm_loss_fn(model)
    lloss = lora_loss_fn(loss_fn, params)
    # B=0 init => adapted loss == base loss
    np.testing.assert_allclose(
        float(lloss(adapters, batches[0])),
        float(loss_fn(params, batches[0])),
        rtol=1e-6,
    )
    per = per_batch_losses(lambda p, b: lloss(p, b), adapters, batches)
    assert len(per) == 3 and all(np.isfinite(v) for v in per)
