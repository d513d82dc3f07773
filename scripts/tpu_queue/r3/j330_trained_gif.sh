#!/bin/bash
# Trained-policy episode GIF: the tracked render gallery is random-policy
# only. Train the quickstart LBF config WITH checkpointing on the chip, then
# render one greedy episode from the saved best params (CPU viewer) — the
# GIF should show coordinated foraging, and the pair (random vs trained) is
# the visual counterpart of the 0.0 -> 0.96 BASELINE row.
set -e
cd /root/repo
timeout 3000 python examples/quickstart.py logger.checkpointing.save_model=True
uid=$(ls -t checkpoints/ff_ippo | head -1)
echo "rendering from checkpoint uid=$uid"
timeout 900 python examples/render_episode.py env=lbf policy=checkpoint \
  checkpoint_uid="$uid" out=results/render/lbf_trained.gif
