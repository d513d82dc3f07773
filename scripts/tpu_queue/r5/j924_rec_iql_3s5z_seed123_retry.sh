#!/bin/bash
# Completes the rec-IQL 3s5z seed band: seed 123 alone (j923-retry's two-seed run
# cannot fit both 10M runs + absolute metrics inside one job timeout at the
# measured ~1.5 min/eval cadence; seed 7 completes there).
cd /root/repo
timeout 8000 python scripts/run_seeds.py q_learning.rec_iql default_rec_iql 123 \
  env=smax env/scenario=3s5z arch.num_envs=64 \
  system.total_timesteps=10000000 arch.num_evaluation=50
