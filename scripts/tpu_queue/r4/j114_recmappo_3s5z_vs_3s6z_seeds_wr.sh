#!/bin/bash
# j102 rerun WITH per-seed win-rate logging for the high-seed-variance map.
cd /root/repo
timeout 7200 python -m mava_tpu.advanced_usage.rec_mappo_vmap_seeds \
  env=smax env/scenario=3s5z_vs_3s6z network=rnn arch.num_envs=64 \
  system.recurrent_chunk_size=16 system.total_timesteps=10000000 \
  arch.num_evaluation=40 +system.num_seeds=3 logger.use_json=True
