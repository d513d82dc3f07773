#!/bin/bash
# Full CPU suite + the driver's multichip dryrun on the queue box at r5 HEAD.
cd /root/repo
timeout 7200 make test || exit 1
XLA_FLAGS=--xla_force_host_platform_device_count=8 timeout 1800 python -c "
import jax; jax.config.update('jax_platforms','cpu')
import __graft_entry__ as g
g.dryrun_multichip(8)
print('dryrun_multichip(8) OK')"
