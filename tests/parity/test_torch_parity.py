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
