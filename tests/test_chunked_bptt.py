"""Chunked-BPTT equivalence (VERDICT r1 item 5).

The recurrent systems re-run the GRU from each chunk's STORED initial hidden state
over time-contiguous chunks (`rec_ippo.py` chunk reshape; reference
`mava/systems/ppo/rec_ippo.py:344-365` uses time-strided chunks instead). Two exact
properties pin the implementation:

1. Forward equivalence at ANY chunk size: re-running each chunk from its stored
   input carry reproduces the full-sequence outputs (the chunking only truncates
   gradient flow, never changes the forward values). Since the input-projection
   hoist, the per-sequence `ins @ Wi` matmul tiles differently at different T, so
   the match is last-bit-tolerance rather than bitwise — the same accepted
   float-reassociation class as vmap batching (tests/test_vmap_seeds.py note).
2. Gradient equivalence when chunk boundaries coincide with episode boundaries
   (done=True at each chunk's first step): the carry is reset inside the cell, so
   truncation is a no-op and the summed chunked gradients EXACTLY equal the
   full-sequence gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mava_tpu.networks import ScannedRNN

T, B, A = 8, 4, 2
F = H = 6  # GRU output dim follows the carry width
CHUNK = 4


def _setup(done_at_chunk_boundaries: bool):
    key = jax.random.PRNGKey(0)
    k_x, k_w, k_init, k_done = jax.random.split(key, 4)
    x = jax.random.normal(k_x, (T, B, A, F))
    w = jax.random.normal(k_w, (T, B, A, F))  # GRU output dim = input dim (F)

    if done_at_chunk_boundaries:
        # Episode boundary exactly at each later chunk's first step.
        dones = jnp.zeros((T, B, A), dtype=bool).at[CHUNK].set(True)
    else:
        dones = jax.random.bernoulli(k_done, 0.3, (T, B, A))

    rnn = ScannedRNN(hidden_state_dim=H)
    rnn_collect = ScannedRNN(hidden_state_dim=H, collect_carries=True)
    h0 = ScannedRNN.initialize_carry((B, A), H)
    params = rnn.init(k_init, h0, (x, dones))
    return rnn, rnn_collect, params, h0, x, dones, w


def _full_loss(rnn, params, h0, x, dones, w):
    _, ys = rnn.apply(params, h0, (x, dones))
    return jnp.sum(ys * w)


def _chunked_loss(rnn, params, carries, x, dones, w):
    """Sum of per-chunk losses, each chunk re-run from its stored input carry
    (treated as data, like the system's traj_batch.hstates)."""
    total = 0.0
    for c in range(T // CHUNK):
        sl = slice(c * CHUNK, (c + 1) * CHUNK)
        h_init = jax.lax.stop_gradient(carries[c * CHUNK])
        _, ys = rnn.apply(params, h_init, (x[sl], dones[sl]))
        total = total + jnp.sum(ys * w[sl])
    return total


def _stored_carries(rnn_collect, params, h0, x, dones):
    _, (carries, _) = rnn_collect.apply(params, h0, (x, dones))
    return carries


def test_chunked_forward_matches_full_any_dones():
    rnn, rnn_collect, params, h0, x, dones, w = _setup(False)
    _, ys_full = rnn.apply(params, h0, (x, dones))
    carries = _stored_carries(rnn_collect, params, h0, x, dones)
    for c in range(T // CHUNK):
        sl = slice(c * CHUNK, (c + 1) * CHUNK)
        _, ys_chunk = rnn.apply(params, carries[c * CHUNK], (x[sl], dones[sl]))
        np.testing.assert_allclose(
            np.asarray(ys_full[sl]), np.asarray(ys_chunk), rtol=1e-5, atol=1e-6
        )


def test_chunked_grads_exact_when_boundaries_align_with_dones():
    rnn, rnn_collect, params, h0, x, dones, w = _setup(True)
    carries = _stored_carries(rnn_collect, params, h0, x, dones)

    g_full = jax.grad(lambda p: _full_loss(rnn, p, h0, x, dones, w))(params)
    g_chunk = jax.grad(lambda p: _chunked_loss(rnn, p, carries, x, dones, w))(params)

    for gf, gc in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_chunk)):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gc), rtol=1e-6, atol=1e-6)


def test_chunked_grads_truncate_only_cross_boundary_flow():
    """Sanity: at unaligned boundaries the losses still match exactly (forward
    identity) while gradients differ only by the truncated cross-chunk term."""
    rnn, rnn_collect, params, h0, x, dones, w = _setup(False)
    carries = _stored_carries(rnn_collect, params, h0, x, dones)

    l_full = _full_loss(rnn, params, h0, x, dones, w)
    l_chunk = _chunked_loss(rnn, params, carries, x, dones, w)
    # Per-chunk partial sums reassociate the fp32 reduction: identical values,
    # different rounding order.
    np.testing.assert_allclose(float(l_full), float(l_chunk), rtol=1e-5)

    g_full = jax.grad(lambda p: _full_loss(rnn, p, h0, x, dones, w))(params)
    g_chunk = jax.grad(lambda p: _chunked_loss(rnn, p, carries, x, dones, w))(params)
    diffs = [
        float(jnp.max(jnp.abs(gf - gc)))
        for gf, gc in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_chunk))
    ]
    assert max(diffs) > 0.0  # truncation is real at unaligned boundaries
