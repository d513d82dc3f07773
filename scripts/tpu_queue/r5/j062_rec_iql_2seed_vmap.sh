#!/bin/bash
# Positive companion to the r3 j362 OOM boundary ("vmap-multi-seed is
# memory-bound at ~2 seeds for replay-buffer systems"): 2 VMAPPED rec-IQL
# seeds, SMAX 2s3z, full 10M steps each, one program on one chip. Evidence:
# fits in HBM and both seeds learn (single-seed r4 j976: 91.25% absolute at
# 20-25k steps/s).
cd /root/repo
timeout 9000 python -m mava_tpu.advanced_usage.rec_iql_vmap_seeds \
  env=smax env/scenario=2s3z arch.num_envs=64 \
  system.total_timesteps=10000000 arch.num_evaluation=20 \
  +system.num_seeds=2
