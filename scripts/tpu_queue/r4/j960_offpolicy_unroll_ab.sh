#!/bin/bash
# Act-scan unroll A/B for the off-policy families (follow-up to j040's
# 1.139x ff-PPO win): rec-IQL + ff-ISAC full steps, unroll {1,2}, one process.
cd /root/repo
timeout 4000 python scripts/profile_offpolicy_unroll_ab.py 10
