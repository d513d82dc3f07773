#!/bin/bash
# j920 rerun at 50 evals/seed (200-eval cadence made 2x10M exceed the job
# timeout; the result of record is the final/absolute win rate, not eval
# granularity). Seed band for the rec-IQL 3s5z single-seed 76.9% row.
cd /root/repo
timeout 8000 python scripts/run_seeds.py q_learning.rec_iql default_rec_iql 7,123 \
  env=smax env/scenario=3s5z arch.num_envs=64 \
  system.total_timesteps=10000000 arch.num_evaluation=50
