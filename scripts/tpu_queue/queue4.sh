#!/bin/bash
# MaWalker validation runs (launch after queue_all drains; assumes tunnel up).
cd /root/repo
Q=/root/repo/results/r2_queue

echo "=== job9: ff-IPPO continuous MaWalker (balance+walk) $(date)"
timeout 3000 python -m mava_tpu.systems.ppo.ff_ippo env=mawalker \
  network=continuous_mlp system.total_timesteps=5000000 arch.num_envs=256 \
  arch.num_evaluation=20 logger.use_json=True > $Q/job9_ippo_mawalker.log 2>&1
echo "job9 exit=$? $(date)"

echo "=== job10: ISAC MaWalker (reference defaults) $(date)"
timeout 3000 python -m mava_tpu.systems.sac.ff_isac env=mawalker \
  system.total_timesteps=300000 arch.num_envs=64 arch.num_evaluation=30 \
  logger.use_json=True > $Q/job10_isac_mawalker.log 2>&1
echo "job10 exit=$? $(date)"

echo "=== job11: MASAC MaWalker (reference defaults) $(date)"
timeout 3000 python -m mava_tpu.systems.sac.ff_masac env=mawalker \
  system.total_timesteps=300000 arch.num_envs=64 arch.num_evaluation=30 \
  logger.use_json=True > $Q/job11_masac_mawalker.log 2>&1
echo "job11 exit=$? $(date)"
echo "=== queue4 done $(date)"
