#!/bin/bash
# CNN-path perf pass (VERDICT next-5): f32-vs-bf16 full-step A/B + decomposition.
cd /root/repo
timeout 3600 python scripts/profile_cnn_ab.py 20
