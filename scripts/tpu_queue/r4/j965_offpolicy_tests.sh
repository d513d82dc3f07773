#!/bin/bash
# The off-policy act-scan unroll knob landed after j900 snapshotted the
# suite; re-run the affected system tests on the current code.
cd /root/repo
timeout 3600 python -m pytest tests/test_systems_integration.py -x -q \
  -k "rec_iql or isac or masac" 
