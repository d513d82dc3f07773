#!/bin/bash
# tiny-4ag seed band, sequential fallback: the vmapped CTDE program crashes
# the TPU compiler at BOTH 3 and 4 seeds (fusion_util TransformWindow on the
# seed-lifted windowed op, j104/j105) while the stock program is fine — so
# run the stock program per seed (r1 protocol; identical compile cache hits
# after seed 1, and the per-seed JSONs give real seed bands in the plots).
cd /root/repo
timeout 7200 python scripts/run_seeds.py ppo.ff_mappo default_ff_mappo 42,7,123 \
  env=rware env/scenario=tiny-4ag arch.num_envs=256 \
  system.total_timesteps=20000000 arch.num_evaluation=40 logger.use_json=True
