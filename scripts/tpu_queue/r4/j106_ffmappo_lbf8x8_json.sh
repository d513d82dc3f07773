#!/bin/bash
# North-star curve evidence: ff-MAPPO LBF 8x8-2p-2f-coop with marl-eval JSON
# (the r2 run that solved it predates JSON logging; logs died with the
# container). 3 vmapped seeds, 128 envs, 20M steps (reference budget).
cd /root/repo
timeout 7200 python -m mava_tpu.advanced_usage.ff_mappo_vmap_seeds \
  env=lbf arch.num_envs=128 system.total_timesteps=20000000 \
  arch.num_evaluation=40 +system.num_seeds=3 logger.use_json=True
