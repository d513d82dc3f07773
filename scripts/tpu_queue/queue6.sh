#!/bin/bash
# Round-2 feature-validation jobs (pallas GRU is A/B'd by job2; these cover the
# vmapped lr sweep). Launched by waiter6.sh after the master queue drains.
cd /root/repo
Q=/root/repo/results/r2_queue
if [ -f $Q/queue6.done ]; then echo 'queue6 already ran'; exit 0; fi

echo "=== job16: ff-IPPO vmapped lr sweep (4 lrs, one program) on RWARE $(date)"
timeout 2700 python -m mava_tpu.advanced_usage.ff_ippo_vmap_sweep \
  env=rware env/scenario=tiny-2ag arch.num_envs=128 \
  system.total_timesteps=2000000 arch.num_evaluation=10 \
  '+system.sweep_lrs=[5e-5, 2.5e-4, 1e-3, 5e-3]' \
  logger.use_console=False > $Q/job16_ff_sweep.log 2>&1
echo "job16 exit=$? $(date)"

echo "=== job17: sweep wall-clock vs single stock run (same process) $(date)"
timeout 3000 python - > $Q/job17_sweep_ab.log 2>&1 <<'EOF'
import time, json, jax
from mava_tpu.utils.config import load_config

OV = ["env=rware", "env/scenario=tiny-2ag", "arch.num_envs=128",
      "system.total_timesteps=1000000", "arch.num_evaluation=2",
      "logger.use_console=False"]

from mava_tpu.advanced_usage import ff_ippo_vmap_seeds as vs
from mava_tpu.systems.ppo import ff_ippo

t0 = time.perf_counter()
ff_ippo.run_experiment(load_config("default_ff_ippo", list(OV)))
t_stock = time.perf_counter() - t0

t0 = time.perf_counter()
vs.run_experiment(load_config("default_ff_ippo", list(OV)),
                  sweep_lrs=[5e-5, 2.5e-4, 1e-3, 5e-3])
t_sweep = time.perf_counter() - t0
print(json.dumps({"stock_1config_s": round(t_stock, 2),
                  "sweep_4configs_s": round(t_sweep, 2),
                  "sweep_cost_ratio": round(t_sweep / t_stock, 3)}))
EOF
echo "job17 exit=$? $(date)"
touch $Q/queue6.done
echo "=== queue6 done $(date)"
