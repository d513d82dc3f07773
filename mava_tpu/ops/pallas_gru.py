"""Pallas TPU kernel for the GRU recurrence over a whole sequence.

The hoisted ScannedRNN (`networks/actor_critic.py`) reduces the serial chain to
`h @ Wh` + gate arithmetic per step, with the input projection done upfront as
one wide matmul. Under `lax.scan`, each iteration is still a separately
scheduled loop body: XLA re-stages Wh and the carry per step and pays the loop
dispatch overhead T times. This kernel runs the ENTIRE time loop as ONE Pallas
program: Wh and the carry live in VMEM for all T steps (a cuDNN-style fused
RNN, built TPU-native) and the per-step gate blocks stream through the Pallas
grid pipeline, so HBM traffic is one read of gates_i and one write of the
hidden states.

Semantics (identical to the hoisted scan body — equivalence-tested forward AND
backward in tests/test_pallas_gru.py):

    h_t   = keep_t * h_{t-1}         # keep = 1 - reset
    r,z,n = gates(gates_i_t, h_t @ Wh, b_hn)
    h'_t  = (1-z)*n + z*h_t          # emitted per step; h'_{T-1} is the carry

Grid layout: `(num_row_blocks, T)` — the batch dimension is blocked into
`row_block`-row tiles (outer, parallel in principle; sequential on a TPU core)
and time runs innermost so the VMEM carry scratch chains correctly per block.
Row blocking caps VMEM at ~4 buffers x row_block x 3H floats regardless of
batch size; padded rows compute exact zeros throughout (no NaN propagation).

The backward pass is a second Pallas kernel walking time reversed: it
recomputes the gates from the saved hidden states (flash-style recompute — no
(T,B,3H) activation residuals saved) and accumulates dWh / db_hn in
constant-index output blocks that persist in VMEM across the whole walk.

Reference contrast: the reference's recurrent systems scan flax's GRUCell —
six Dense kernels per step inside the scan (`mava/networks/networks.py`).

Shape constraints (compiled mode): H must be a lane multiple (128); rows are
padded to sublane multiples of 8 internally. The `keep` mask is passed
pre-broadcast to (T,B,H) to stay in the natural (sublane, lane) layout.
Interpret mode is selected automatically off-TPU so CPU tests exercise the
same code path. Gradients w.r.t. `keep` are defined as zero (it encodes the
boolean episode-reset mask, which is not differentiable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rows per grid block. 1024 rows keeps the pipeline's double-buffered
# (row_block, 3H) gate tiles + state tiles comfortably inside ~16MB VMEM at
# H=128 while still amortising the per-step grid overhead.
DEFAULT_ROW_BLOCK = 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _split3(a):
    h = a.shape[-1] // 3
    return a[..., :h], a[..., h : 2 * h], a[..., 2 * h :]


def _fwd_kernel(gates_ref, keep_ref, h0_ref, wh_ref, bhn_ref, hs_ref, h_scr):
    t = pl.program_id(1)  # time is the INNER grid dim; rows are outer

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]

    h = h_scr[:] * keep_ref[0]
    gh = jnp.dot(h, wh_ref[:], preferred_element_type=jnp.float32)
    xr, xz, xn = _split3(gates_ref[0])
    hr, hz, hn = _split3(gh)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * (hn + bhn_ref[:]))
    new_h = (1.0 - z) * n + z * h
    hs_ref[0] = new_h
    h_scr[:] = new_h


def _bwd_kernel(
    gates_ref,
    keep_ref,
    wh_ref,
    bhn_ref,
    hprev_ref,
    g_ref,
    dgates_ref,
    dh_ref,
    dwh_ref,
    dbhn_ref,
):
    b = pl.program_id(0)
    k = pl.program_id(1)  # walks t = T-1 ... 0 via reversed index maps

    # dh_ref is the per-row-block BPTT carry (block index b, constant in k) —
    # after the walk it holds dL/dh0 for the block. dwh/dbhn are constant-index
    # blocks persisting across the WHOLE grid: zero once, accumulate throughout.
    @pl.when(k == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)

    @pl.when(jnp.logical_and(b == 0, k == 0))
    def _():
        dwh_ref[:] = jnp.zeros_like(dwh_ref)
        dbhn_ref[:] = jnp.zeros_like(dbhn_ref)

    keep = keep_ref[0]
    h = hprev_ref[0] * keep
    # Recompute this step's forward gates (cheaper than saving (T,B,3H)).
    gh = jnp.dot(h, wh_ref[:], preferred_element_type=jnp.float32)
    xr, xz, xn = _split3(gates_ref[0])
    hr, hz, hn = _split3(gh)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    hnb = hn + bhn_ref[:]
    n = jnp.tanh(xn + r * hnb)

    d = g_ref[0] + dh_ref[:]  # upstream dL/d(h'_t): emitted + carried
    dn = d * (1.0 - z)
    dz = d * (h - n)
    dh = d * z
    dan = dn * (1.0 - n * n)
    dar = (dan * hnb) * r * (1.0 - r)
    daz = dz * z * (1.0 - z)
    # gates_h cotangent blocks: (dar, daz, dan*r); gates_i: (dar, daz, dan).
    dgh = jnp.concatenate([dar, daz, dan * r], axis=-1)
    dgates_ref[0] = jnp.concatenate([dar, daz, dan], axis=-1)
    dbhn_ref[:] += jnp.sum(dan * r, axis=0, keepdims=True)
    # dWh += h^T @ dgh  — contract the batch (sublane) dims.
    dwh_ref[:] += lax.dot_general(
        h, dgh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dh += dgh @ Wh^T — contract the 3H dims.
    dh += lax.dot_general(
        dgh, wh_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dh_ref[:] = dh * keep  # through the reset gate into h_{t-1}


def _pad_rows(x, rows):
    pad = rows - x.shape[-2]
    if pad == 0:
        return x
    widths = [(0, 0)] * (x.ndim - 2) + [(0, pad), (0, 0)]
    return jnp.pad(x, widths)


def _blocking(b: int, row_block):
    rb = int(row_block) if row_block else DEFAULT_ROW_BLOCK
    rb = _round_up(max(min(rb, b), 8), 8)
    nb = -(-max(b, 8) // rb)
    return rb, nb, rb * nb  # block rows, num blocks, padded rows


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def gru_sequence(gates_i, keep, h0, w_h, b_hn, row_block=None):
    """Run the GRU recurrence over time in one fused kernel.

    gates_i (T,B,3H): x @ Wi + bi, precomputed for the whole sequence.
    keep    (T,B,H):  float32 1-reset mask, pre-broadcast over H.
    h0      (B,H), w_h (H,3H), b_hn (H,).
    row_block: rows per grid tile (None → DEFAULT_ROW_BLOCK; tests use small
    values to exercise multi-block paths).
    Returns hs (T,B,H): per-step hidden states; hs[-1] is the final carry, and
    concat([h0[None], hs[:-1]]) are the pre-reset input carries per step.
    """
    return _fwd_call(gates_i, keep, h0, w_h, b_hn, row_block)


def _fwd_call(gates_i, keep, h0, w_h, b_hn, row_block):
    t_len, b, h3 = gates_i.shape
    h = h3 // 3
    rb, nb, bp = _blocking(b, row_block)
    gates_p = _pad_rows(gates_i, bp)
    keep_p = _pad_rows(keep, bp)
    h0_p = _pad_rows(h0, bp)
    bhn2 = b_hn[None, :]

    hs = pl.pallas_call(
        _fwd_kernel,
        grid=(nb, t_len),
        in_specs=[
            pl.BlockSpec((1, rb, h3), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, h), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, h), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h3), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rb, h), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t_len, bp, h), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rb, h), jnp.float32)],
        interpret=_interpret(),
    )(gates_p, keep_p, h0_p, w_h, bhn2)
    return hs[:, :b, :]


def _gru_fwd(gates_i, keep, h0, w_h, b_hn, row_block):
    hs = _fwd_call(gates_i, keep, h0, w_h, b_hn, row_block)
    return hs, (gates_i, keep, h0, w_h, b_hn, hs)


def _gru_bwd(row_block, res, g_hs):
    gates_i, keep, h0, w_h, b_hn, hs = res
    t_len, b, h3 = gates_i.shape
    h = h3 // 3
    rb, nb, bp = _blocking(b, row_block)

    # h_prev per step: h0 at t=0, else hs[t-1] (the pre-reset input carry).
    hprev = jnp.concatenate([h0[None], hs[:-1]], axis=0)
    gates_p = _pad_rows(gates_i, bp)
    keep_p = _pad_rows(keep, bp)
    hprev_p = _pad_rows(hprev, bp)
    g_p = _pad_rows(g_hs, bp)
    bhn2 = b_hn[None, :]

    rev3 = lambda b_, k: (t_len - 1 - k, b_, 0)
    dgates, dh0, dwh, dbhn = pl.pallas_call(
        _bwd_kernel,
        grid=(nb, t_len),
        in_specs=[
            pl.BlockSpec((1, rb, h3), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, h), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h3), lambda b_, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda b_, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, h), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, h), rev3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rb, h3), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, h), lambda b_, k: (b_, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h3), lambda b_, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda b_, k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_len, bp, h3), jnp.float32),
            jax.ShapeDtypeStruct((bp, h), jnp.float32),
            jax.ShapeDtypeStruct((h, h3), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
        ],
        interpret=_interpret(),
    )(gates_p, keep_p, w_h, bhn2, hprev_p, g_p)

    return (
        dgates[:, :b, :],
        jnp.zeros_like(keep),
        dh0[:b],
        dwh,
        dbhn[0],
    )


gru_sequence.defvjp(_gru_fwd, _gru_bwd)
