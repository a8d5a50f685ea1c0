"""Text / LM data pipeline.

Reference pipeline (/root/reference/gpt2_hessian.py:21-58): HF
``load_dataset("wikipedia", "20220301.simple")`` -> ``shuffle(seed)`` ->
``select(subsample)`` -> tokenizer ``map`` (pad to max_length,
pad_token=eos) -> manual collate to (input_ids, attention_mask) tensors;
plus the offline pre-tokenized Pythia datasets with a ``Tokens`` field and
shape-asserting collate (/root/reference/diego_pythia.py:37-61).

TPU-native shape: batches are STACKED numpy arrays with a leading
``num_batches`` axis so dataset-level curvature runs as one ``lax.scan``
(see curvature.operators.DatasetHessianOperator) instead of a host loop.
This environment has zero network egress, so the HF path is gated: it works
with a local datasets cache / offline dir, and otherwise callers fall back
to ``data.synthetic.random_token_batches``.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import numpy as np


def stack_batches(
    arrays: Dict[str, np.ndarray], batch_size: int, drop_remainder: bool = True
) -> Dict[str, np.ndarray]:
    """(N, ...) arrays -> (num_batches, batch_size, ...) stacked batches."""
    out = {}
    for k, v in arrays.items():
        n = (len(v) // batch_size) * batch_size
        if n == 0:
            raise ValueError(f"not enough rows ({len(v)}) for one batch of {batch_size}")
        out[k] = v[:n].reshape(-1, batch_size, *v.shape[1:])
    return out


def collate_tokens(
    token_lists: Iterable[Iterable[int]],
    max_length: int,
    pad_id: int,
    *,
    truncate: bool = True,
) -> Dict[str, np.ndarray]:
    """Manual collate: pad/truncate ragged token lists to (N, max_length)
    input_ids + attention_mask (the reference's manual_collate_fn,
    gpt2_hessian.py:44-58, and the shape-asserting Pythia collate,
    diego_pythia.py:37-61)."""
    rows, masks = [], []
    for toks in token_lists:
        toks = list(toks)[: max_length if truncate else None]
        if len(toks) > max_length:
            raise ValueError(f"sequence length {len(toks)} > max_length {max_length}")
        pad = max_length - len(toks)
        rows.append(toks + [pad_id] * pad)
        masks.append([1] * len(toks) + [0] * pad)
    return {
        "input_ids": np.asarray(rows, np.int32),
        "attention_mask": np.asarray(masks, np.int32),
    }


def load_lm_dataset(
    name: str = "wikipedia",
    config: str = "20220301.simple",
    *,
    tokenizer=None,
    subsample: float | int = 1.0,
    seed: int = 42,
    max_length: int = 512,
    batch_size: int = 8,
    text_field: str = "text",
    tokens_field: Optional[str] = None,
    offline_dir: Optional[str] = None,
) -> Dict[str, np.ndarray]:
    """HF-dataset LM pipeline -> stacked batches dict.

    * ``offline_dir`` set + ``tokens_field`` -> pre-tokenized on-disk dataset
      (``datasets.load_from_disk``), the reference's offline Pythia path.
    * otherwise ``datasets.load_dataset(name, config)`` (requires a local
      cache in this zero-egress environment) + ``tokenizer``.
    * ``subsample``: fraction (float <= 1) or absolute row count (int), after
      a seeded shuffle — the reference's ``shuffle(seed).select(...)``.
    """
    import datasets  # lazy; heavy import

    if offline_dir:
        ds = datasets.load_from_disk(offline_dir)
    else:
        ds = datasets.load_dataset(name, config, split="train")
    ds = ds.shuffle(seed=seed)
    n = len(ds)
    take = int(n * subsample) if isinstance(subsample, float) and subsample <= 1.0 else int(subsample)
    take = max(1, min(take, n))
    ds = ds.select(range(take))

    if tokens_field:
        token_lists = ds[tokens_field]
        pad_id = 0
    else:
        if tokenizer is None:
            raise ValueError("tokenizer required for raw-text datasets")
        if tokenizer.pad_token is None:
            tokenizer.pad_token = tokenizer.eos_token
        token_lists = [
            tokenizer(t, truncation=True, max_length=max_length)["input_ids"]
            for t in ds[text_field]
        ]
        pad_id = tokenizer.pad_token_id
    collated = collate_tokens(token_lists, max_length, pad_id)
    return stack_batches(collated, batch_size)


_TEXT_EXTENSIONS = (
    ".txt", ".md", ".rst", ".py", ".tex", ".cfg", ".toml", ".yaml", ".json",
)


def load_local_corpus(
    path: str,
    *,
    max_length: int,
    batch_size: int,
    subsample: float | int = 1.0,
    seed: int = 42,
    extensions: tuple = _TEXT_EXTENSIONS,
    max_bytes: int = 64 * 1024 * 1024,
) -> Dict[str, np.ndarray]:
    """Deterministic byte-level LM corpus from text already on disk.

    The zero-egress stand-in for the reference's wikipedia pipeline
    (/root/reference/gpt2.py:15-57): real-distribution text with learnable
    structure, no network, no tokenizer download.  Files under ``path``
    (a file or a directory, filtered by ``extensions``) are read in sorted
    order, concatenated with double-newline separators, encoded as raw
    bytes (vocab 256 — valid ids for any LM with vocab_size >= 256),
    chunked into non-overlapping ``max_length`` sequences, seed-shuffled,
    subsampled (fraction <= 1.0 or absolute count), and stacked into
    ``(num_batches, batch_size, max_length)`` batches with all-ones
    attention masks (no padding — every chunk is full).
    """
    import os

    if os.path.isfile(path):
        files = [path]
    elif os.path.isdir(path):
        files = []
        for root, dirs, names in os.walk(path):
            dirs.sort()
            for n in sorted(names):
                if n.endswith(extensions):
                    files.append(os.path.join(root, n))
    else:
        raise FileNotFoundError(f"local corpus path {path!r} does not exist")
    if not files:
        raise FileNotFoundError(
            f"no text files ({'/'.join(extensions)}) under {path!r}"
        )

    pieces, total = [], 0
    for f in files:
        try:
            with open(f, "rb") as fh:
                data = fh.read(max_bytes - total)
        except OSError:
            continue
        pieces.append(data)
        total += len(data) + 2
        if total >= max_bytes:
            break
    blob = b"\n\n".join(pieces)
    ids = np.frombuffer(blob, dtype=np.uint8)
    n_chunks = len(ids) // max_length
    if n_chunks < batch_size:
        raise ValueError(
            f"corpus too small: {len(ids)} bytes -> {n_chunks} chunks of "
            f"{max_length} < batch_size {batch_size}"
        )
    chunks = ids[: n_chunks * max_length].reshape(n_chunks, max_length)
    rng = np.random.RandomState(seed)
    chunks = chunks[rng.permutation(n_chunks)]
    take = (
        int(n_chunks * subsample)
        if isinstance(subsample, float) and subsample <= 1.0
        else int(subsample)
    )
    take = max(batch_size, min(take, n_chunks))
    chunks = chunks[:take].astype(np.int32)
    return stack_batches(
        {
            "input_ids": chunks,
            "attention_mask": np.ones_like(chunks),
        },
        batch_size,
    )


def batches_to_device(stacked: Dict[str, np.ndarray], sharding=None):
    """Host numpy -> device jnp (optionally sharded along the batch axis)."""
    import jax
    import jax.numpy as jnp

    if sharding is None:
        return jax.tree_util.tree_map(jnp.asarray, stacked)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), stacked
    )
