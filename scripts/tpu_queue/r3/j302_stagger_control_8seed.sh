#!/bin/bash
# Stagger A/B at n=8 per arm: the 3-seed probe (j300/j301) showed treatment
# mean 3.01 vs control 2.41 driven by one seed — underpowered. Same paired
# protocol (identical inits per seed index across arms), 8 seeds in one
# vmapped program.
cd /root/repo
timeout 3600 python -m mava_tpu.advanced_usage.ff_ippo_vmap_seeds \
  env=rware env/scenario=tiny-2ag arch.num_envs=512 \
  system.total_timesteps=20000000 arch.num_evaluation=20 \
  +system.num_seeds=8 logger.use_json=True
