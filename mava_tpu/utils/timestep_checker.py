"""Derive total_timesteps <-> num_updates (reference
`mava/utils/total_timestep_checker.py:21-49`).

In the mesh design there is no `update_batch_size`; the per-step batch is
n_devices * rollout_length * num_envs (num_envs is per device).
"""

from __future__ import annotations

import jax


def check_total_timesteps(config):
    """Fill in whichever of total_timesteps / num_updates is unset."""
    if config.system.get("total_timesteps") is None and config.system.get(
        "num_updates"
    ) is None:
        raise ValueError("Set one of system.total_timesteps / system.num_updates.")

    n_devices = config.arch.get("n_devices") or len(jax.devices())
    config.arch.n_devices = n_devices

    steps_per_update = (
        n_devices * config.system.rollout_length * config.arch.num_envs
    )

    if config.system.get("total_timesteps") is None:
        config.system.total_timesteps = int(
            config.system.num_updates * steps_per_update
        )
    else:
        config.system.num_updates = int(
            config.system.total_timesteps // steps_per_update
        )
        print(
            f"Setting num_updates = {config.system.num_updates} from "
            f"total_timesteps = {config.system.total_timesteps}."
        )
    return config
