"""Offline pre-tokenized dataset path (the reference's diego_pythia flow)."""

import numpy as np
import pytest

datasets = pytest.importorskip("datasets")


def test_load_lm_dataset_offline_tokens(tmp_path):
    from hessian_llm_vision_tpu.data import load_lm_dataset

    ds = datasets.Dataset.from_dict(
        {"Tokens": [[1, 2, 3, 4], [5, 6], [7, 8, 9, 10, 11, 12], [13] * 8,
                    [14, 15], [16, 17, 18]]}
    )
    d = str(tmp_path / "offline")
    ds.save_to_disk(d)

    stacked = load_lm_dataset(
        offline_dir=d,
        tokens_field="Tokens",
        max_length=8,
        batch_size=2,
        subsample=1.0,
        seed=0,
    )
    assert stacked["input_ids"].shape == (3, 2, 8)
    assert stacked["attention_mask"].shape == (3, 2, 8)
    assert stacked["input_ids"].dtype == np.int32
    # padding is zeros with mask zeros
    rows = stacked["input_ids"].reshape(-1, 8)
    masks = stacked["attention_mask"].reshape(-1, 8)
    assert ((rows == 0) | (masks == 1)).all()


def test_load_lm_dataset_subsample_count(tmp_path):
    from hessian_llm_vision_tpu.data import load_lm_dataset

    ds = datasets.Dataset.from_dict({"Tokens": [[i, i + 1] for i in range(20)]})
    d = str(tmp_path / "offline2")
    ds.save_to_disk(d)
    stacked = load_lm_dataset(
        offline_dir=d, tokens_field="Tokens", max_length=4, batch_size=2,
        subsample=6,  # absolute row count
    )
    assert stacked["input_ids"].shape == (3, 2, 4)
