#!/bin/bash
# Quickstart re-run after switching its default task to LBF 2s-8x8-2p-2f-coop:
# the j230 RWARE-500k default ran green but ended at return 0.06 (that env
# needs 2M+ steps to move) — a weak first-user demo. LBF solves (return 1.0)
# within the new 2M-step default, so the out-of-the-box experience is a
# solved task.
cd /root/repo
timeout 3000 python examples/quickstart.py
