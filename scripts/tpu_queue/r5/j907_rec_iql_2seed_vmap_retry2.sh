#!/bin/bash
# j905 got past init (the r5 buffer fix) but died in the FIRST update call:
# at num_evaluation=20 each fused call runs 500k env-steps = 35-70s of device
# time for 2 seeds, beyond the ~60s tunnel RPC limit (CLAUDE.md: raise
# num_evaluation for slow-sps systems so each learn call stays under ~30s).
# 100 evals -> 100k steps/call -> ~5-10s/call.
cd /root/repo
timeout 9000 python -m mava_tpu.advanced_usage.rec_iql_vmap_seeds \
  env=smax env/scenario=2s3z arch.num_envs=64 \
  system.total_timesteps=10000000 arch.num_evaluation=100 \
  +system.num_seeds=2
