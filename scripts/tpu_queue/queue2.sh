#!/bin/bash
# TPU job queue v2 (reordered 23:05: cheapest/highest-information first —
# bench sanity, GRU 4-way A/B, vmap-seeds A/B, then the long 3s_vs_5z retry,
# then swimmer SAC validations).
cd /root/repo
Q=/root/repo/results/r2_queue

echo "=== probing tunnel $(date)"
for i in $(seq 1 60); do
  if timeout 120 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
    echo "tunnel up after $i probes $(date)"; break
  fi
  if [ "$i" = 60 ]; then echo "tunnel never recovered $(date)"; exit 1; fi
  sleep 120
done

echo "=== job0: bench sanity (headline number on the real chip) $(date)"
timeout 2700 python bench.py > $Q/job0_bench.log 2>&1
echo "job0 exit=$? $(date)"

echo "=== job2: GRU pallas/hoisted/cell/flax A/B on rec-IPPO step $(date)"
timeout 3600 python scripts/profile_gru_ab.py 10 > $Q/job2_gru_ab.log 2>&1
echo "job2 exit=$? $(date)"

echo "=== job5: vmap-seeds A/B bench $(date)"
timeout 3600 python scripts/bench_vmap_seeds.py 2 4 8 > $Q/job5_vmap_ab.log 2>&1
echo "job5 exit=$? $(date)"

echo "=== job1: 3s_vs_5z retry (2 seeds, 128 envs, ent anneal) $(date)"
timeout 5400 python scripts/run_seeds.py ppo.rec_ippo default_rec_ippo 42,7 \
  env=smax env/scenario=3s_vs_5z network=rnn arch.num_envs=128 \
  system.recurrent_chunk_size=16 system.total_timesteps=10000000 \
  system.ent_coef=0.02 system.ent_coef_final=0.001 \
  arch.num_evaluation=20 logger.use_console=False > $Q/job1_3s_vs_5z.log 2>&1
echo "job1 exit=$? $(date)"

echo "=== job3: ISAC MaSwimmer (reference defaults) $(date)"
timeout 2700 python -m mava_tpu.systems.sac.ff_isac env=maswimmer \
  system.total_timesteps=200000 arch.num_envs=64 arch.num_evaluation=20 \
  logger.use_json=True > $Q/job3_isac_maswimmer.log 2>&1
echo "job3 exit=$? $(date)"

echo "=== job4: MASAC MaSwimmer (reference defaults) $(date)"
timeout 2700 python -m mava_tpu.systems.sac.ff_masac env=maswimmer \
  system.total_timesteps=200000 arch.num_envs=64 arch.num_evaluation=20 \
  logger.use_json=True > $Q/job4_masac_maswimmer.log 2>&1
echo "job4 exit=$? $(date)"
echo "=== queue done $(date)"
