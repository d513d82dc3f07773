#!/bin/bash
# Sanity: the steady-state bench (3 warmups, 10 timed calls) on the real chip.
cd /root/repo
timeout 2700 python bench.py
