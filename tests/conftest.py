"""Test configuration.

Multi-device paths are exercised on a virtual 8-device CPU mesh. NOTE: platform
selection must be in-process (`jax.config.update`) — the `JAX_PLATFORMS` env var hangs
in images where the TPU tunnel plugin is installed.
"""

import os

# Must be set before jax initialises its backends.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def fast_config_overrides():
    """Config shrinking for cheap end-to-end integration tests (the reference's test
    strategy, `test/conftest.py:20-48`): run everything, tiny sizes."""
    return [
        "system.num_updates=2",
        "arch.num_evaluation=1",
        "system.rollout_length=4",
        "arch.num_envs=2",
        "arch.num_eval_episodes=8",
        "arch.num_absolute_metric_eval_episodes=8",
        "arch.absolute_metric=False",
        # '+' form: sets the key for PPO systems and harmlessly adds it for
        # off-policy configs that don't have it (strict overrides otherwise reject
        # unknown keys).
        "+system.ppo_epochs=1",
        "+system.num_minibatches=2",
        "logger.use_console=False",
    ]
