#!/bin/bash
# VERDICT r5 item-4: 64 vs 128 vs 256 envs on rec-IPPO SMAX 3s5z, one process.
cd /root/repo
timeout 5400 python scripts/profile_oppoint_ab.py rec 10 3
