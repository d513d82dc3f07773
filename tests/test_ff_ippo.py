"""End-to-end integration test for ff-IPPO on the 8-device virtual mesh.

The reference tests run each system's real `run_experiment` with a shrunken config
(`test/integration_test.py:35-46`); same strategy here, plus it exercises the real
multi-device shard_map path (which the reference never tests, SURVEY.md §4)."""

from mava_tpu.utils.config import load_config


def test_ff_ippo_runs_multidevice(fast_config_overrides):
    from mava_tpu.systems.ppo.ff_ippo import run_experiment

    cfg = load_config(
        "default_ff_ippo", fast_config_overrides + ["env.kwargs.time_limit=16"]
    )
    perf = run_experiment(cfg)
    assert isinstance(perf, float)
