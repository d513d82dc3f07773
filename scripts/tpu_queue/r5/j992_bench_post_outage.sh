#!/bin/bash
# Post-outage headline bench sanity: confirms the restored tunnel reproduces
# the r5 official band (3.29-3.38M env-steps/s/chip) so the driver's
# end-of-round bench.py has a fresh same-day comparison point.
cd /root/repo
timeout 1800 python bench.py
