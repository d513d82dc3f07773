"""Logger facade tests: win-rate math, describe aggregation, JSON structure."""

import json

import numpy as np

from mava_tpu.utils.config import load_config
from mava_tpu.utils.logger import JsonLogger, LogEvent, MavaLogger, describe


def _cfg(tmp_path, **logger_overrides):
    cfg = load_config("default_ff_ippo", ["logger.use_console=False"])
    cfg.logger.base_exp_path = str(tmp_path)
    for k, v in logger_overrides.items():
        cfg.logger[k] = v
    return cfg


def test_winrate_uses_actual_episode_count(tmp_path):
    cfg = _cfg(tmp_path)
    cfg.arch.num_eval_episodes = 32
    lg = MavaLogger(cfg)
    # Evaluator ran 40 episodes (rounded up from 32); 30 wins -> 75%, never >100%.
    metrics = {"won_episode": np.ones(40, dtype=bool), "episode_return": np.ones(40)}
    metrics["won_episode"][30:] = False
    out = dict(metrics)
    lg.log(out, t=10, t_eval=0, event=LogEvent.EVAL)
    assert out["win_rate"] == 75.0
    lg.stop()


def test_describe_summarises_arrays():
    d = describe(np.array([1.0, 2.0, 3.0]))
    assert d["mean"] == 2.0 and d["min"] == 1.0 and d["max"] == 3.0
    assert describe(3.5) == 3.5  # scalars pass through


def test_json_logger_marl_eval_structure(tmp_path):
    cfg = _cfg(tmp_path)
    jl = JsonLogger(cfg, unique_token="tok")
    jl.log_stat("episode_return/mean", 1.5, step=100, eval_step=0, event=LogEvent.EVAL)
    jl.log_stat("win_rate", 50.0, step=100, eval_step=0, event=LogEvent.EVAL)
    jl.log_stat("episode_return/mean", 2.0, step=200, eval_step=0, event=LogEvent.ABSOLUTE)
    # TRAIN events and unknown metrics are filtered.
    jl.log_stat("episode_return/mean", 9.9, step=100, eval_step=0, event=LogEvent.TRAIN)
    jl.log_stat("some_other", 1.0, step=100, eval_step=0, event=LogEvent.EVAL)

    data = json.load(open(jl.file_path))
    run = data[cfg.env.env_name][cfg.env.scenario.task_name][cfg.logger.system_name][
        f"run_{cfg.system.seed}"
    ]
    assert run["step_0"]["mean_episode_return"] == [1.5]
    assert run["step_0"]["win_rate"] == [50.0]
    assert run["step_0"]["step_count"] == 100
    assert run["absolute_metrics"]["mean_episode_return"] == [2.0]
    assert "some_other" not in run["step_0"]
