#!/bin/bash
# Quickstart example at its shipped defaults on the real chip (VERDICT next-9):
# proves the README-advertised first-contact path works end-to-end.
cd /root/repo
timeout 2700 python examples/quickstart.py
