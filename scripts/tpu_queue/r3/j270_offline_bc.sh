#!/bin/bash
# Offline-MARL loop on hardware: record 2M steps of improving ff-IPPO
# behaviour to a Vault, then behaviour-clone a fresh actor from it and
# evaluate in the live env (examples/bc_from_vault.py) — the vault READ path
# the reference leaves open.
cd /root/repo
timeout 3000 python -m mava_tpu.advanced_usage.ff_ippo_store_experience \
  env=rware env/scenario=tiny-2ag arch.num_envs=128 \
  system.total_timesteps=2000000 arch.num_evaluation=10 \
  logger.use_console=False || exit 1
timeout 2700 python examples/bc_from_vault.py env=rware \
  env/scenario=tiny-2ag bc_epochs=30
