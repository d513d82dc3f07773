#!/bin/bash
# Seed breadth for the north-star recurrent config: rec-MAPPO SMAX 3s5z was a
# single-seed row (91.6% absolute); 3 vmapped seeds in one program pin the
# spread at the 10M reference budget.
cd /root/repo
timeout 7200 python -m mava_tpu.advanced_usage.rec_mappo_vmap_seeds \
  env=smax env/scenario=3s5z network=rnn arch.num_envs=64 \
  system.recurrent_chunk_size=16 system.total_timesteps=10000000 \
  arch.num_evaluation=40 +system.num_seeds=3 logger.use_json=True
