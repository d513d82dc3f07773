#!/bin/bash
# rec-IQL Pallas-vs-hoisted GRU A/B on the real compiled update (VERDICT next-2).
cd /root/repo
timeout 3600 python scripts/profile_iql_gru_ab.py 10
