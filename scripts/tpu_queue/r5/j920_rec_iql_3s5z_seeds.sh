#!/bin/bash
# Seed band for the rec-IQL SMAX 3s5z row (single-seed 76.9% absolute @10M):
# two more sequential seeds through the stock program (the measured-correct
# pattern for replay-family seed breadth — docs/tpu_performance.md §9).
cd /root/repo
timeout 8000 python scripts/run_seeds.py q_learning.rec_iql default_rec_iql 7,123 \
  env=smax env/scenario=3s5z arch.num_envs=64 \
  system.total_timesteps=10000000
