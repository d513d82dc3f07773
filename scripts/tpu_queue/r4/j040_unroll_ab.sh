#!/bin/bash
# New headline-path lever (VERDICT r3 weak-1): rollout-scan unroll {1,2,4} on
# the full ff-IPPO compiled step at the bench operating point, one process.
cd /root/repo
timeout 4000 python scripts/profile_unroll_ab.py 10
