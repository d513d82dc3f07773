"""plot_results.py consumes the marl-eval JSON structure and writes PNGs."""

import json
import os
import sys

import numpy as np
import pytest

pytest.importorskip("matplotlib")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import plot_results  # noqa: E402


def _metrics(seed, n=5):
    return {
        f"step_{i}": {
            "step_count": (i + 1) * 1000,
            "mean_episode_return": [float(seed + i)],
            "win_rate": [float(10 * i)],
        }
        for i in range(n)
    }


def _write(tmp_path, name, alg, runs):
    d = {"EnvA": {"task-1": {alg: runs}}}
    p = tmp_path / name
    p.mkdir(parents=True)
    (p / "metrics.json").write_text(json.dumps(d))
    return str(p / "metrics.json")


def test_collect_merges_runs_across_files(tmp_path):
    f1 = _write(tmp_path, "r1", "ff_ippo", {"run_42": _metrics(0)})
    f2 = _write(tmp_path, "r2", "ff_ippo", {"run_7": _metrics(5)})
    data = plot_results.collect([f1, f2])
    assert len(data["EnvA"]["task-1"]["ff_ippo"]) == 2


def test_series_sorts_and_averages():
    steps = {
        "b": {"step_count": 2000, "mean_episode_return": [2.0, 4.0]},
        "a": {"step_count": 1000, "mean_episode_return": [1.0]},
    }
    x, y = plot_results._series(steps, "mean_episode_return")
    np.testing.assert_array_equal(x, [1000, 2000])
    np.testing.assert_array_equal(y, [1.0, 3.0])


def test_plot_task_writes_png_with_seed_band(tmp_path):
    f = _write(
        tmp_path, "r", "rec_iql", {"run_1": _metrics(0), "run_2": _metrics(3)}
    )
    data = plot_results.collect([f])
    out = plot_results.plot_task(
        "EnvA", "task-1", data["EnvA"]["task-1"], "win_rate", str(tmp_path / "plots")
    )
    assert out.endswith(".png") and os.path.getsize(out) > 1000


def test_plot_task_skips_missing_metric(tmp_path):
    f = _write(tmp_path, "r", "ff_ippo", {"run_1": _metrics(0)})
    data = plot_results.collect([f])
    for steps_dict in [
        runs[1] for runs in data["EnvA"]["task-1"]["ff_ippo"]
    ]:
        for entry in steps_dict.values():
            del entry["win_rate"]
    out = plot_results.plot_task(
        "EnvA", "task-1", data["EnvA"]["task-1"], "win_rate", str(tmp_path / "plots")
    )
    assert out == ""


def test_plot_task_splits_budget_groups(tmp_path):
    # A 5-step run and a 10-step run are NOT seeds of each other: both series
    # must be drawn in full (legend shows two entries, no truncating interp).
    f = _write(
        tmp_path, "r", "rec_ippo", {"run_1": _metrics(0, n=5), "run_2": _metrics(0, n=10)}
    )
    data = plot_results.collect([f])
    out = plot_results.plot_task(
        "EnvA", "task-1", data["EnvA"]["task-1"], "win_rate", str(tmp_path / "plots")
    )
    assert out.endswith(".png") and os.path.getsize(out) > 1000
