#!/bin/bash
# VERDICT r5 item-1 done-condition: the EXACT j104 crash config (3 vmapped
# seeds, ff-MAPPO RWARE tiny-4ag, 256 envs) must now compile and TRAIN on the
# chip with the auto-defaulted sequential GAE (r4 died in fusion_util.cc
# TransformWindow after ~10 min of compile). Short budget — the evidence is
# compile + sustained training + per-seed evals, not a 20M curve (j107 already
# recorded the seed band sequentially).
cd /root/repo
timeout 5400 python -m mava_tpu.advanced_usage.ff_mappo_vmap_seeds \
  env=rware env/scenario=tiny-4ag arch.num_envs=256 \
  system.total_timesteps=2000000 arch.num_evaluation=4 \
  +system.num_seeds=3 logger.use_json=True
