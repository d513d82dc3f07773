#!/bin/bash
# Retry of j062 after the on-device buffer-init fix (the original crashed the
# tunnel worker in learner_setup device_get-ing GBs of replay zeros). Runs
# AFTER j900 (lexical order) so the fix is also suite-validated first.
cd /root/repo
timeout 9000 python -m mava_tpu.advanced_usage.rec_iql_vmap_seeds \
  env=smax env/scenario=2s3z arch.num_envs=64 \
  system.total_timesteps=10000000 arch.num_evaluation=20 \
  +system.num_seeds=2
