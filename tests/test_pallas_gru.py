"""Equivalence of the Pallas fused-GRU sequence kernel vs the hoisted scan.

`ops/pallas_gru.gru_sequence` claims to compute exactly the ScannedRNN
recurrence (forward, and backward via its hand-written VJP kernel with gate
recomputation). These tests pin that claim in interpret mode on CPU — the same
kernel code that compiles on TPU (CLAUDE.md invariant: perf transformations
are distribution-preserving, with tests).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mava_tpu.ops.pallas_gru import gru_sequence


def _ref_gru(gates_i, keep, h0, w_h, b_hn):
    """Pure-JAX reference: the hoisted ScannedRNN step body."""

    def step(h_prev, inp):
        g_t, keep_t = inp
        h = h_prev * keep_t
        xr, xz, xn = jnp.split(g_t, 3, axis=-1)
        hr, hz, hn = jnp.split(h @ w_h, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * (hn + b_hn))
        new_h = (1.0 - z) * n + z * h
        return new_h, new_h

    _, hs = jax.lax.scan(step, h0, (gates_i, keep))
    return hs


def _setup(T=7, B=5, H=8, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    gates_i = jax.random.normal(ks[0], (T, B, 3 * H))
    resets = jax.random.bernoulli(ks[1], 0.3, (T, B))
    keep = jnp.broadcast_to(
        1.0 - resets[..., None].astype(jnp.float32), (T, B, H)
    )
    h0 = jax.random.normal(ks[2], (B, H))
    w_h = jax.random.normal(ks[3], (H, 3 * H)) / jnp.sqrt(H)
    b_hn = jax.random.normal(ks[4], (H,)) * 0.1
    return gates_i, keep, h0, w_h, b_hn


def test_forward_matches_scan():
    args = _setup()
    hs_pallas = gru_sequence(*args)
    hs_ref = _ref_gru(*args)
    np.testing.assert_allclose(
        np.asarray(hs_pallas), np.asarray(hs_ref), rtol=1e-6, atol=1e-6
    )


def test_backward_matches_scan_grads():
    gates_i, keep, h0, w_h, b_hn = _setup(T=6, B=4, H=8, seed=3)

    def loss_pallas(g, h, w, b):
        hs = gru_sequence(g, keep, h, w, b)
        return jnp.sum(jnp.sin(hs) * jnp.arange(1, hs.size + 1).reshape(hs.shape))

    def loss_ref(g, h, w, b):
        hs = _ref_gru(g, keep, h, w, b)
        return jnp.sum(jnp.sin(hs) * jnp.arange(1, hs.size + 1).reshape(hs.shape))

    grads_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(gates_i, h0, w_h, b_hn)
    grads_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(gates_i, h0, w_h, b_hn)
    for gp, gr, name in zip(grads_p, grads_r, ("dgates", "dh0", "dwh", "dbhn")):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), rtol=1e-5, atol=1e-6, err_msg=name
        )


def test_row_padding_is_invisible():
    """B=5 pads to 8 sublanes internally; results must match an unpadded run."""
    gates_i, keep, h0, w_h, b_hn = _setup(T=4, B=5, H=8, seed=1)
    hs5 = gru_sequence(gates_i, keep, h0, w_h, b_hn)
    # Embed in a B=8 problem whose first 5 rows are identical.
    pad = lambda x: jnp.concatenate(
        [x, jnp.zeros(x.shape[:-2] + (3, x.shape[-1]))], axis=-2
    )
    hs8 = gru_sequence(pad(gates_i), pad(keep), pad(h0), w_h, b_hn)
    np.testing.assert_allclose(
        np.asarray(hs5), np.asarray(hs8[:, :5]), rtol=1e-6, atol=1e-6
    )


def test_vmap_over_sequence_batch():
    """vmap (the vmap-seeds axis) over the kernel matches per-slice calls."""
    a0 = _setup(T=5, B=4, H=8, seed=10)
    a1 = _setup(T=5, B=4, H=8, seed=11)
    stacked = jax.tree.map(lambda x, y: jnp.stack([x, y]), a0, a1)
    hs_v = jax.vmap(gru_sequence)(*stacked)
    np.testing.assert_allclose(
        np.asarray(hs_v[0]), np.asarray(gru_sequence(*a0)), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(hs_v[1]), np.asarray(gru_sequence(*a1)), rtol=1e-6, atol=1e-6
    )


def test_row_blocking_matches_single_block():
    """Forcing multiple row blocks (row_block=8 on B=20 → 3 blocks with
    padding) must reproduce the single-block kernel and its gradients —
    the per-block carry chain and the cross-block dWh/db_hn accumulation
    are exercised for real."""
    gates_i, keep, h0, w_h, b_hn = _setup(T=5, B=20, H=8, seed=5)

    hs_one = gru_sequence(gates_i, keep, h0, w_h, b_hn)
    hs_blk = gru_sequence(gates_i, keep, h0, w_h, b_hn, 8)
    np.testing.assert_allclose(
        np.asarray(hs_blk), np.asarray(hs_one), rtol=1e-6, atol=1e-6
    )

    def loss(g, h, w, bb, rb):
        hs = gru_sequence(g, keep, h, w, bb, rb)
        return jnp.sum(jnp.cos(hs) * jnp.arange(1, hs.size + 1).reshape(hs.shape))

    g_one = jax.grad(loss, argnums=(0, 1, 2, 3))(gates_i, h0, w_h, b_hn, None)
    g_blk = jax.grad(loss, argnums=(0, 1, 2, 3))(gates_i, h0, w_h, b_hn, 8)
    for a, bwd, name in zip(g_blk, g_one, ("dgates", "dh0", "dwh", "dbhn")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bwd), rtol=1e-5, atol=1e-6, err_msg=name
        )
