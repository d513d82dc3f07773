"""CPU learning-threshold regression gate (VERDICT r4 next-3).

The fast integration tests assert only that training RUNS (reference-style,
`test_systems_integration.py`); a semantic regression that still trains — a
flipped GAE sign, broken action masking, a wrong TD target — would pass them
green. These two opt-in tests assert the system actually LEARNS on the
8-device virtual CPU mesh in ~1-4 minutes each:

  * ff-IPPO on Matrax Penalty-25 (on-policy family through GAE + clipped PPO):
    300k steps reaches ~18-20/episode (the safe coordinated equilibrium pays
    2/step over 10 steps); a random policy scores ~-31 and a deliberately
    sign-flipped GAE lands around -155 (both measured) — threshold 10.
  * rec-IQL on Matrax Climbing (off-policy recurrent family through replay +
    double-DQN): the safe equilibrium pays 5/step; random is ~-34/episode —
    threshold asserts clear learning over random.

Opt-in because of wall-clock (the multiproc-smoke precedent):

    RUN_LEARNING_GATE=1 python -m pytest tests/test_learning_gate.py -x -q
    # or: make test-learning

The round queue runs this on the validation box once per round.
"""

import os

import pytest

_OPT_IN = os.environ.get("RUN_LEARNING_GATE") == "1"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not _OPT_IN, reason="learning gate is opt-in: set RUN_LEARNING_GATE=1"
    ),
]


def test_ff_ippo_learns_matrax_penalty():
    from mava_tpu.systems.ppo.ff_ippo import run_experiment
    from mava_tpu.utils.config import load_config

    cfg = load_config(
        "default_ff_ippo",
        [
            "env=matrax",
            "env.scenario.task_name=Penalty-25-stateless-v0",
            "env.kwargs.time_limit=10",
            "arch.num_envs=16",
            "system.rollout_length=128",
            "system.total_timesteps=300000",
            "arch.num_evaluation=3",
            "arch.num_eval_episodes=32",
            "arch.absolute_metric=False",
            "logger.use_console=False",
        ],
    )
    perf = run_experiment(cfg)
    # Measured at this config: correct GAE 18.6, random ~-31, flipped GAE -155.
    assert perf > 10.0, f"ff-IPPO failed the Penalty learning gate: {perf}"


def test_rec_iql_learns_matrax_climbing():
    from mava_tpu.systems.q_learning.rec_iql import run_experiment
    from mava_tpu.utils.config import load_config

    cfg = load_config(
        "default_rec_iql",
        [
            "env=matrax",
            "env.scenario.task_name=Climbing-stateless-v0",
            "env.kwargs.time_limit=10",
            "arch.num_envs=16",
            "system.total_timesteps=120000",
            "arch.num_evaluation=3",
            "arch.num_eval_episodes=32",
            "arch.absolute_metric=False",
            "logger.use_console=False",
        ],
    )
    perf = run_experiment(cfg)
    # Safe equilibrium pays 50/episode; random ~-34 (BASELINE.md rec-IQL
    # Climbing row: 69 vs -340 random at a larger budget/limit).
    assert perf > 20.0, f"rec-IQL failed the Climbing learning gate: {perf}"
