#!/bin/bash
# ff-ISAC act-vs-per-epoch-train decomposition via epoch-grid fit (VERDICT next-4).
cd /root/repo
timeout 3600 python scripts/profile_sac.py 10
