#!/bin/bash
# Stagger A/B on an env where the mechanism's precondition actually holds:
# MaSwarm episodes are EXACTLY 100 steps (pure time-limit termination), so
# synchronized resets put every env at the same episode phase forever — the
# lockstep case arXiv:2511.21011 targets. (RWARE's collision termination
# already desynchronizes naturally; the j302/j303 A/B there was null/negative.)
# ff-IPPO continuous, 8 seeds, 512 envs.
cd /root/repo
timeout 3600 python -m mava_tpu.advanced_usage.ff_ippo_vmap_seeds \
  env=maswarm network=continuous_mlp arch.num_envs=512 system.total_timesteps=20000000 \
  arch.num_evaluation=20 +system.num_seeds=8 logger.use_json=True
