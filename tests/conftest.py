"""Test harness: force an 8-device virtual CPU backend before jax imports.

The standard JAX fake-backend trick (SURVEY.md §4e): multi-chip sharding tests
run on 8 virtual CPU devices; kernels' Pallas paths run in interpret mode.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("RCOT_PALLAS_INTERPRET", "1")

import jax

# A sitecustomize on some images registers a TPU plugin and forces
# jax_platforms programmatically, stomping the env var — override it back.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the compile-heavy integration tests
# (trainer loop, full tiny-model forwards) dominate suite runtime; caching
# their executables on disk makes every run after the first much faster
# (measured 35 s -> 5 s for the tiny train-iteration program on this box).
from rcot_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_model_cfg():
    from rcot_tpu.utils.config import ModelConfig
    return ModelConfig(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
                       heads=(1, 2, 4, 8), parity_params=False)


@pytest.fixture(scope="session")
def tiny_config():
    from rcot_tpu.utils.config import (Config, CriticConfig, DataConfig,
                                       ModelConfig, TrainConfig)
    return Config(
        model=ModelConfig(dim=8, num_blocks=(1, 1, 1, 1),
                          num_refinement_blocks=1, parity_params=False),
        critic=CriticConfig(patch_size=32),
        data=DataConfig(patch_size=32),
        train=TrainConfig(batch_size=2),
    )
