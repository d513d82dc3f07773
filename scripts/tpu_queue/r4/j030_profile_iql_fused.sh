#!/bin/bash
# Phase split of the FUSED rec-IQL step (j250 analogue): re-measure act/train
# shares with fused_target_pass=True to document where the remaining train
# milliseconds live after the scan fusion.
cd /root/repo
timeout 3000 python scripts/profile_iql.py
