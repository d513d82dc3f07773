#!/bin/bash
# Full CPU test suite + driver dryrun, serialized AFTER the TPU jobs (one-core
# box: never overlap compiles). make test takes up to ~1h here on a cold cache.
cd /root/repo
timeout 5400 make test || exit 1
echo "=== dryrun_multichip(8) ==="
XLA_FLAGS=--xla_force_host_platform_device_count=8 timeout 1800 python -c "
import jax; jax.config.update('jax_platforms','cpu')
import __graft_entry__ as g
g.dryrun_multichip(8)
print('dryrun_multichip OK')"
