"""Test configuration: force CPU with 8 simulated devices.

The reference "tests" multi-GPU only by rerunning scripts with
CUDA_VISIBLE_DEVICES varied (SURVEY.md §4); the TPU-native equivalent of
multi-chip-without-a-cluster is XLA's host-platform device simulation, which
lets mesh/psum/sharding tests run anywhere (SURVEY.md §4 "implication").

Must run before jax initializes its backends, hence env vars at import time.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Zero-egress environment: make HF hub attempts fail IMMEDIATELY instead of
# burning retry timeouts (the loud-fallback test alone spent 415 s of the
# 26-min suite waiting on HTTP retries; offline mode raises at once and the
# code paths under test — loud SystemExit / --allow_fallback — are the same)
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The driver environment pins JAX_PLATFORMS to the TPU tunnel and a
# sitecustomize pre-imports jax, so the env var alone cannot be overridden
# here — use the config API, which wins over the env snapshot.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (long-compile AOT/scale cases); "
        "without it the FAST suite runs — the per-change default "
        "(VERDICT r3 #9). Full-coverage runs: split the tiers into two "
        "processes (unit+golden / parity+distributed) — a single process "
        "running all ~300 tests hits a deterministic XLA:CPU compile "
        "segfault around the 290th compile on this image.",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow: needs --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
