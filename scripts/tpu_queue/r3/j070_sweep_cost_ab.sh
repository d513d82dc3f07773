#!/bin/bash
# Sweep-vs-stock wall-clock cost ratio, same process — r2 job17 rerun.
cd /root/repo
timeout 3000 python - <<'PYEOF'
import time, json
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
PYEOF
