#!/bin/bash
# Staggered-resets A/B, CONTROL arm: stock synchronized resets, ff-IPPO
# tiny-2ag at the 512-env operating point where synchronized episode
# boundaries should hurt most (BASELINE: 4.5-7.3 return at 20M steps there
# vs 10-11.4 at 256 envs). 3 seeds in one program (vmap-seeds).
cd /root/repo
timeout 3000 python -m mava_tpu.advanced_usage.ff_ippo_vmap_seeds \
  env=rware env/scenario=tiny-2ag arch.num_envs=512 \
  system.total_timesteps=20000000 arch.num_evaluation=20 \
  +system.num_seeds=3 logger.use_json=True
