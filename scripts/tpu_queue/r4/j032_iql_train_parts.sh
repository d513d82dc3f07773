#!/bin/bash
# Decompose the rec-IQL train epoch (sample gather / fused fwd / grad) to
# locate the real ~113 ms/epoch bound exposed by j010+j030.
cd /root/repo
timeout 3000 python scripts/profile_iql_train_parts.py 10
