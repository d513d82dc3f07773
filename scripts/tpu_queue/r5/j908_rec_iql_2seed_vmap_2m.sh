#!/bin/bash
# Final shape of the 2-seed vmapped rec-IQL evidence: 2M-step budget (the r3
# j030 single-seed sanity precedent: 53-72% win at 2M) — the 10M attempt
# (j907) trains correctly but the measured ~4k sps combined (the vmapped
# buffer-write scatter cost, docs/tpu_performance.md §9) makes 10M a
# multi-hour run; the claims under test (2 seeds FIT in HBM on one chip and
# LEARN) need the shorter budget only.
cd /root/repo
timeout 7200 python -m mava_tpu.advanced_usage.rec_iql_vmap_seeds \
  env=smax env/scenario=2s3z arch.num_envs=64 \
  system.total_timesteps=2000000 arch.num_evaluation=20 \
  +system.num_seeds=2
