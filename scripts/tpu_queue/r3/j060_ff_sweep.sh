#!/bin/bash
# ff-IPPO vmapped lr sweep learning run — r2 job16 rerun (logs lost).
cd /root/repo
timeout 2700 python -m mava_tpu.advanced_usage.ff_ippo_vmap_sweep \
  env=rware env/scenario=tiny-2ag arch.num_envs=128 \
  system.total_timesteps=2000000 arch.num_evaluation=10 \
  '+system.sweep_lrs=[5e-5, 2.5e-4, 1e-3, 5e-3]' \
  logger.use_console=False
