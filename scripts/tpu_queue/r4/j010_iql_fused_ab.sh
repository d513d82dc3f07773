#!/bin/bash
# VERDICT r3 #1: A/B the fused double-DQN target pass on the real chip —
# {fused, unfused} x {pallas, hoisted} on the full compiled rec-IQL step at
# the recorded 2s3z/64-env operating point, one process. Winner sets defaults.
cd /root/repo
timeout 4000 python scripts/profile_iql_fused_ab.py 10
