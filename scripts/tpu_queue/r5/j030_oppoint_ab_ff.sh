#!/bin/bash
# VERDICT r5 item-4: 512 vs 1024 vs 2048 envs on the headline ff-IPPO step,
# ONE process, 3 blocks x 10 calls per point.
cd /root/repo
timeout 5400 python scripts/profile_oppoint_ab.py ff 10 3
