"""assoc vs sequential GAE equivalence (VERDICT r4 next-1).

The associative-scan GAE crashes the TPU compiler when lifted by a seed vmap at
specific shapes (`fusion_util.cc TransformWindow`, BASELINE.md r4 j104/j105), so
`ops/gae.py` ships the reference's reverse-scan formulation behind
`impl="sequential"` and the seed-vmapped advanced-usage programs default to it.
These tests pin (a) the two implementations agree to float-associativity
tolerance, (b) the sequential impl survives exactly the lift that crashed on
TPU (seed vmap at the j104 (T, E=256, A=4) shape runs on the CPU mesh for both
impls — the crash is a TPU backend bug, not a semantics difference), and (c)
the defaulting: stock systems read 'assoc', seed programs force 'sequential'.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mava_tpu.ops import calculate_gae
from mava_tpu.ops.gae import calculate_gae_with_next_done


def _random_inputs(rng, shape):
    rewards = rng.randn(*shape).astype(np.float32)
    values = rng.randn(*shape).astype(np.float32)
    dones = (rng.rand(*shape) < 0.2).astype(np.float32)
    last = np.asarray(rng.randn(*shape[1:]), dtype=np.float32)
    return rewards, values, dones, last


@pytest.mark.parametrize("shape", [(13,), (16, 5, 3), (128, 8, 2)])
def test_assoc_equals_sequential(shape):
    rewards, values, dones, last = _random_inputs(np.random.RandomState(0), shape)
    out_assoc = calculate_gae(rewards, values, dones, last, 0.99, 0.95, impl="assoc")
    out_seq = calculate_gae(
        rewards, values, dones, last, 0.99, 0.95, impl="sequential"
    )
    for a, s in zip(out_assoc, out_seq):
        np.testing.assert_allclose(np.asarray(a), np.asarray(s), rtol=1e-5, atol=1e-5)


def test_assoc_equals_sequential_next_done_variant():
    rng = np.random.RandomState(1)
    shape = (32, 4, 5)
    rewards, values, dones, _ = _random_inputs(rng, shape)
    last_done = (rng.rand(*shape[1:]) < 0.2).astype(np.float32)
    last_val = rng.randn(*shape[1:]).astype(np.float32)
    out_assoc = calculate_gae_with_next_done(
        rewards, values, dones, last_done, last_val, 0.99, 0.95, impl="assoc"
    )
    out_seq = calculate_gae_with_next_done(
        rewards, values, dones, last_done, last_val, 0.99, 0.95, impl="sequential"
    )
    for a, s in zip(out_assoc, out_seq):
        np.testing.assert_allclose(np.asarray(a), np.asarray(s), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("impl", ["assoc", "sequential"])
def test_seed_vmapped_gae_at_the_j104_shape(impl):
    """The exact lift that SIGABRTed the TPU backend (3 vmapped seeds over a
    (T, 256 envs, 4 agents) GAE, r4 j104) — jitted + vmapped here on CPU for
    both impls; per-seed outputs must equal the unvmapped ones."""
    rng = np.random.RandomState(2)
    seeds, T, E, A = 3, 8, 256, 4
    rewards = rng.randn(seeds, T, E, A).astype(np.float32)
    values = rng.randn(seeds, T, E, A).astype(np.float32)
    dones = (rng.rand(seeds, T, E, A) < 0.2).astype(np.float32)
    last = rng.randn(seeds, E, A).astype(np.float32)

    fn = lambda r, v, d, lv: calculate_gae(r, v, d, lv, 0.99, 0.95, impl=impl)
    batched = jax.jit(jax.vmap(fn))(rewards, values, dones, last)
    for s in range(seeds):
        single = fn(rewards[s], values[s], dones[s], last[s])
        for b, u in zip(batched, single):
            np.testing.assert_allclose(
                np.asarray(b[s]), np.asarray(u), rtol=1e-5, atol=1e-5
            )


def test_unknown_impl_raises():
    r = jnp.ones((4, 2))
    with pytest.raises(ValueError, match="gae_impl"):
        calculate_gae(r, r, r, r[0], 0.99, 0.95, impl="magic")


def test_seed_programs_default_to_sequential():
    """ff_ippo_vmap_seeds.learner_setup (shared by seeds/sweep/MAPPO/PBT) must
    force gae_impl='sequential' unless the user overrides it."""
    from mava_tpu import envs as environments
    from mava_tpu.advanced_usage import ff_ippo_vmap_seeds as vs
    from mava_tpu.parallel import make_mesh, num_learner_devices
    from mava_tpu.utils.config import load_config

    cfg = load_config(
        "default_ff_ippo",
        [
            "env.kwargs.time_limit=8",
            "arch.num_envs=2",
            "system.rollout_length=4",
            "system.num_updates=1",
            "logger.use_console=False",
        ],
    )
    mesh = make_mesh()
    cfg.arch.n_devices = num_learner_devices(mesh)
    cfg.system.num_updates_per_eval = 1
    assert cfg.system.get("gae_impl", "assoc") == "assoc"  # stock default
    env, _ = environments.make(cfg)
    vs.learner_setup(env, jax.random.PRNGKey(0), cfg, mesh, num_seeds=2)
    assert cfg.system.gae_impl == "sequential"

    # Explicit user override wins.
    cfg2 = load_config(
        "default_ff_ippo",
        [
            "env.kwargs.time_limit=8",
            "arch.num_envs=2",
            "system.rollout_length=4",
            "system.num_updates=1",
            "+system.gae_impl=assoc",
            "logger.use_console=False",
        ],
    )
    cfg2.arch.n_devices = num_learner_devices(mesh)
    cfg2.system.num_updates_per_eval = 1
    env2, _ = environments.make(cfg2)
    vs.learner_setup(env2, jax.random.PRNGKey(0), cfg2, mesh, num_seeds=2)
    assert cfg2.system.gae_impl == "assoc"
