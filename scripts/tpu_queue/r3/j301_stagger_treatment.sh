#!/bin/bash
# Staggered-resets A/B, TREATMENT arm: arch.stagger_resets=True (random-action
# burn-in of k_i ~ U[0,500) steps per env at setup, envs/stagger.py,
# arXiv:2511.21011). Identical seeds/param inits/env resets to j300 — the key
# split order draws the stagger key after everything else, so the arms differ
# only by the burn-in.
cd /root/repo
timeout 3000 python -m mava_tpu.advanced_usage.ff_ippo_vmap_seeds \
  env=rware env/scenario=tiny-2ag arch.num_envs=512 \
  system.total_timesteps=20000000 arch.num_evaluation=20 \
  +system.num_seeds=3 arch.stagger_resets=True logger.use_json=True
