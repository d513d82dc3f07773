#!/bin/bash
# Seed band for the north-star rec-MAPPO SMAX 6h_vs_8z row (single seed 53.1%
# absolute at 10M in r2); 3 vmapped seeds at the recorded operating point
# (64 envs, chunk 16, 10M) — mirrors r3's j324 protocol.
cd /root/repo
timeout 7200 python -m mava_tpu.advanced_usage.rec_mappo_vmap_seeds \
  env=smax env/scenario=6h_vs_8z network=rnn arch.num_envs=64 \
  system.recurrent_chunk_size=16 system.total_timesteps=10000000 \
  arch.num_evaluation=40 +system.num_seeds=3 logger.use_json=True
