#!/bin/bash
# Final full-suite + driver-dryrun run after the round-3 code-review fixes (SAC dedup assert, PBT control gate, stagger helper)
# (stagger feature, quickstart switch, multiproc fix) — serialized through
# the queue like every heavy job on this one-core box.
cd /root/repo
timeout 5400 make test || exit 1
echo "=== dryrun_multichip(8) ==="
XLA_FLAGS=--xla_force_host_platform_device_count=8 timeout 1800 python -c "
import jax; jax.config.update('jax_platforms','cpu')
import __graft_entry__ as g
g.dryrun_multichip(8)
print('dryrun_multichip OK')"
