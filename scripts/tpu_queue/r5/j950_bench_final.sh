#!/bin/bash
# Official headline bench repeat at r5 HEAD (band check before the driver's
# own end-of-round run).
cd /root/repo
timeout 2500 python bench.py
