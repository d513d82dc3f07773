#!/bin/bash
# j100 rerun WITH per-seed win-rate logging (the headline unit for SMAX
# bands; j100 recorded returns only — 18.19/18.37/18.56 of 20 at 10M).
cd /root/repo
timeout 7200 python -m mava_tpu.advanced_usage.rec_mappo_vmap_seeds \
  env=smax env/scenario=6h_vs_8z network=rnn arch.num_envs=64 \
  system.recurrent_chunk_size=16 system.total_timesteps=10000000 \
  arch.num_evaluation=40 +system.num_seeds=3 logger.use_json=True
