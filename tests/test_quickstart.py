"""The quickstart example runs end-to-end (shrunken config) — reference ships
`examples/Quickstart.ipynb`; ours must stay runnable."""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = [
    "system.total_timesteps=512",
    "arch.num_envs=2",
    "system.rollout_length=4",
    "arch.num_evaluation=1",
    "arch.num_eval_episodes=8",
    "arch.num_absolute_metric_eval_episodes=8",
    "arch.absolute_metric=False",
    "env.kwargs.time_limit=8",
    "+system.ppo_epochs=1",
    "+system.num_minibatches=2",
    "logger.use_console=False",
]


def test_quickstart_runs(monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "quickstart", os.path.join(REPO, "examples", "quickstart.py")
    )
    quickstart = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(quickstart)

    monkeypatch.setattr(sys, "argv", ["quickstart.py"] + TINY)
    result = quickstart.main()
    assert isinstance(result, float)
