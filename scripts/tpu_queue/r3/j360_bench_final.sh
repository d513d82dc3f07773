#!/bin/bash
# Bench sanity after every round-3 change (stagger wiring in learner_setup,
# review fixes): confirms the headline path is unperturbed before the driver
# takes the official round-end number.
cd /root/repo
timeout 1800 python bench.py
