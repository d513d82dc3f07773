#!/bin/bash
# MaAnt validation runs (launch after queue4; assumes tunnel up).
cd /root/repo
Q=/root/repo/results/r2_queue

echo "=== job12: ff-IPPO continuous MaAnt (gait learning) $(date)"
timeout 3000 python -m mava_tpu.systems.ppo.ff_ippo env=maant \
  network=continuous_mlp system.total_timesteps=5000000 arch.num_envs=256 \
  arch.num_evaluation=20 logger.use_json=True > $Q/job12_ippo_maant.log 2>&1
echo "job12 exit=$? $(date)"

echo "=== job13: ISAC MaAnt (reference defaults) $(date)"
timeout 3000 python -m mava_tpu.systems.sac.ff_isac env=maant \
  system.total_timesteps=300000 arch.num_envs=64 arch.num_evaluation=30 \
  logger.use_json=True > $Q/job13_isac_maant.log 2>&1
echo "job13 exit=$? $(date)"

echo "=== job14: MASAC MaAnt (reference defaults) $(date)"
timeout 3000 python -m mava_tpu.systems.sac.ff_masac env=maant \
  system.total_timesteps=300000 arch.num_envs=64 arch.num_evaluation=30 \
  logger.use_json=True > $Q/job14_masac_maant.log 2>&1
echo "job14 exit=$? $(date)"
echo "=== queue5 done $(date)"

echo "=== job15: MASAC MaHumanoid (reference defaults) $(date)"
timeout 3000 python -m mava_tpu.systems.sac.ff_masac env=mahumanoid \
  system.total_timesteps=300000 arch.num_envs=64 arch.num_evaluation=30 \
  logger.use_json=True > $Q/job15_masac_mahumanoid.log 2>&1
echo "job15 exit=$? $(date)"
echo "=== queue5 done(2) $(date)"
