#!/bin/bash
# rec-IQL act-vs-train bisect on the real chip (VERDICT next-4).
cd /root/repo
timeout 3600 python scripts/profile_iql.py
