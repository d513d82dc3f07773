"""Equivalence of the vmapped multi-seed learner vs the stock single-seed one.

The vmap-seeds module (`advanced_usage/ff_ippo_vmap_seeds.py`) claims pure
replication: seed s of the batched program must produce the state the stock
ff-IPPO learner produces when started from seed s's slice — identical RNG
streams, identical update sequence (CLAUDE.md invariant: perf transformations
are distribution-preserving, with tests). Comparison is tight-tolerance rather
than bitwise: vmap lowers per-seed matmuls to batched kernels whose float
accumulation order differs in the last bits."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from mava_tpu import envs as environments
from mava_tpu.parallel import (
    DATA_AXIS,
    build_learner,
    make_mesh,
    num_learner_devices,
)
from mava_tpu.systems.ppo import ff_ippo
from mava_tpu.systems.ppo.types import LearnerState
from mava_tpu.types import ExperimentOutput
from mava_tpu.utils.config import load_config


def test_vmap_seeds_matches_stock_learner_bitwise():
    from mava_tpu.advanced_usage import ff_ippo_vmap_seeds as vs

    cfg = load_config(
        "default_ff_ippo",
        [
            "env.kwargs.time_limit=8",
            "arch.num_envs=2",
            "system.rollout_length=4",
            "system.num_updates=1",
            "system.ppo_epochs=1",
            "system.num_minibatches=2",
            "logger.use_console=False",
        ],
    )
    mesh = make_mesh()
    n_devices = num_learner_devices(mesh)
    cfg.arch.n_devices = n_devices
    cfg.system.num_updates_per_eval = 1
    num_seeds = 2

    env, _ = environments.make(cfg)
    key = jax.random.PRNGKey(0)

    # Batched state via the module's own setup.
    learn_vmap, _, state_vmap = vs.learner_setup(env, key, cfg, mesh, num_seeds)

    # Stock learner over the same mesh.
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    learn_stock, _, _ = ff_ippo.learner_setup(env, tuple(keys), cfg, mesh)

    out_vmap = learn_vmap(state_vmap)
    out_vmap = jax.device_get(out_vmap)

    for s in range(num_seeds):
        # Start the stock learner from seed s's exact slice of the batched state.
        state_s = jax.tree.map(lambda x: x[s], jax.device_get(state_vmap))
        state_s = LearnerState(
            params=vs._put(state_s.params, mesh, P()),
            opt_states=vs._put(state_s.opt_states, mesh, P()),
            key=vs._put(state_s.key, mesh, P(DATA_AXIS)),
            env_state=vs._put(state_s.env_state, mesh, P(DATA_AXIS)),
            timestep=vs._put(state_s.timestep, mesh, P(DATA_AXIS)),
        )
        out_s = jax.device_get(learn_stock(state_s))

        got = jax.tree.map(lambda x: x[s], out_vmap.learner_state)
        want = out_s.learner_state
        for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            g, w = np.asarray(g), np.asarray(w)
            if np.issubdtype(g.dtype, np.floating):
                np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-6)
            else:
                np.testing.assert_array_equal(g, w)
