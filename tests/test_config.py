"""Config composition and override semantics."""

import pytest

from mava_tpu.utils.config import load_config


def test_default_composition():
    cfg = load_config("default_ff_ippo")
    assert cfg.env.env_name == "RobotWarehouse"
    assert cfg.env.scenario.task_name == "tiny-2ag"
    assert cfg.system.rollout_length == 128
    assert cfg.arch.num_envs == 16
    assert cfg.logger.system_name == "ff_ippo"


def test_leaf_override():
    cfg = load_config("default_ff_ippo", ["system.gamma=0.9", "arch.num_envs=4"])
    assert cfg.system.gamma == 0.9
    assert cfg.arch.num_envs == 4


def test_scenario_switch():
    cfg = load_config("default_ff_ippo", ["env.scenario=tiny-4ag"])
    assert cfg.env.scenario.task_config.num_agents == 4


def test_new_key_injection():
    cfg = load_config("default_ff_ippo")
    cfg.system.num_agents = 7  # struct-mode-off equivalent
    assert cfg.system.num_agents == 7


def test_bad_override_raises():
    with pytest.raises(ValueError):
        load_config("default_ff_ippo", ["notakeyvalue"])
