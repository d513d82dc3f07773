#!/bin/bash
# Gigastep waypoint under PARTIAL observability (j162 validated the fobs
# variant at 48.2% absolute win) — completes the 2x2 scenario grid
# (hide_and_seek x waypoint, fobs x pobs) with measured rows.
cd /root/repo
timeout 3600 python -m mava_tpu.systems.ppo.ff_ippo env=gigastep \
  env/scenario=waypoint_5_vs_5_pobs arch.num_envs=128 \
  system.total_timesteps=2000000 arch.num_evaluation=10 logger.use_json=True
