"""Pallas TPU kernel for the LSTM recurrence.

The sequential time loop is the hot spot of every (bi)LSTM in the zoo: the
per-step work (a (B, H) @ (H, 4H) matmul + elementwise gates) is tiny, so a
``lax.scan`` is dominated by loop machinery rather than compute.  This
kernel restructures the layer TPU-first:

  1. the input projection ``x @ W_x + b`` for ALL steps is one large MXU
     matmul done outside the kernel (XLA-optimal);
  2. the recurrence runs inside a single pallas kernel: the recurrent
     weights (H, 4H) stay resident in VMEM, the precomputed projections
     stream in as grid blocks, and the (B, H) carry lives in VMEM scratch
     that persists across the sequential TPU grid.

Gate math matches flax.linen.OptimizedLSTMCell (i, f, g, o ordering):
  c' = sigmoid(f) c + sigmoid(i) tanh(g);  h' = sigmoid(o) tanh(c').
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_kernel(xw_ref, wh_ref, y_ref, h_ref, c_ref):
    """One grid step: process a (B, Tc, 4H) chunk of input projections."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    Tc = xw_ref.shape[1]
    H = h_ref.shape[1]

    def body(t, carry):
        h, c = carry
        gates = xw_ref[:, t, :] + jnp.dot(
            h, wh_ref[:], preferred_element_type=jnp.float32
        )
        i = jax.nn.sigmoid(gates[:, 0 * H : 1 * H])
        f = jax.nn.sigmoid(gates[:, 1 * H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H : 4 * H])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        y_ref[:, t, :] = h
        return (h, c)

    h, c = jax.lax.fori_loop(0, Tc, body, (h_ref[:], c_ref[:]))
    h_ref[:] = h
    c_ref[:] = c


@partial(jax.jit, static_argnames=("chunk", "interpret"))
def lstm_recurrence(xw, w_h, chunk: int = 256, interpret: bool = False):
    """Run the LSTM recurrence over precomputed input projections.

    Args:
        xw: (B, T, 4H) == x @ W_x + b  (T must be a multiple of ``chunk``).
        w_h: (H, 4H) recurrent weights.
        chunk: time steps per grid block (bounds VMEM use).
        interpret: run in pallas interpret mode (CPU testing).

    Returns:
        (B, T, H) hidden states.
    """
    B, T, H4 = xw.shape
    H = H4 // 4
    assert T % chunk == 0, (T, chunk)
    grid = (T // chunk,)
    return pl.pallas_call(
        _lstm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (B, chunk, H4), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((H, H4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (B, chunk, H), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, H), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=interpret,
    )(xw, w_h)


def _lstm_fwd_kernel(xw_ref, wh_ref, y_ref, cseq_ref, h_ref, c_ref):
    """Forward kernel that ALSO streams out the cell-state sequence —
    the residual the backward kernel needs (gates are recomputed in the
    reverse pass from xw and h, so only (B, T, H) extra HBM is spent
    instead of the (B, T, 4H) gate tensor).

    Grid is (B/B_blk, T/chunk), batch OUTER: batch rows are independent,
    so blocking B is what keeps the streamed working set inside scoped
    VMEM at large H — the sequential carry resets at each batch block's
    first time chunk."""
    t_step = pl.program_id(1)

    @pl.when(t_step == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    Tc = xw_ref.shape[1]
    H = h_ref.shape[1]

    def body(t, carry):
        h, c = carry
        gates = xw_ref[:, t, :] + jnp.dot(
            h, wh_ref[:], preferred_element_type=jnp.float32
        )
        i = jax.nn.sigmoid(gates[:, 0 * H : 1 * H])
        f = jax.nn.sigmoid(gates[:, 1 * H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H : 4 * H])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        y_ref[:, t, :] = h
        cseq_ref[:, t, :] = c
        return (h, c)

    h, c = jax.lax.fori_loop(0, Tc, body, (h_ref[:], c_ref[:]))
    h_ref[:] = h
    c_ref[:] = c


def _lstm_bwd_kernel(
    xw_ref, wh_ref, hprev_ref, c_ref, cprev_ref, dy_ref,
    dxw_ref, dwh_ref, dh_ref, dc_ref,
):
    """Reverse-time BPTT over one chunk (grid iterates chunks last-to-
    first via the reversed index map).  Gates are recomputed from
    xw_t + h_{t-1} W_h — one extra VMEM matmul per step in exchange for
    not storing (B, T, 4H) activations (HBM is the scarce resource).

    carries (VMEM scratch): dh (grad into h_t from the future), dc
    (grad into c_t from the future), and the (H, 4H) dW_h accumulator.
    """
    b_step = pl.program_id(0)
    t_step = pl.program_id(1)

    @pl.when(t_step == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dc_ref[:] = jnp.zeros_like(dc_ref)

    @pl.when((b_step == 0) & (t_step == 0))
    def _():
        # the (H, 4H) output block maps to the same location every grid
        # step, so it stays VMEM-resident: accumulate into it directly
        # (across time chunks AND batch blocks)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)

    Tc = xw_ref.shape[1]
    H = dh_ref.shape[1]
    wh = wh_ref[:]

    def body(k, carry):
        t = Tc - 1 - k
        dh_next, dc_next = carry
        hprev = hprev_ref[:, t, :]
        gates = xw_ref[:, t, :] + jnp.dot(
            hprev, wh, preferred_element_type=jnp.float32
        )
        i = jax.nn.sigmoid(gates[:, 0 * H : 1 * H])
        f = jax.nn.sigmoid(gates[:, 1 * H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H : 4 * H])
        tanh_c = jnp.tanh(c_ref[:, t, :])
        cprev = cprev_ref[:, t, :]

        dh = dy_ref[:, t, :] + dh_next
        dc = dh * o * (1.0 - tanh_c * tanh_c) + dc_next
        dzi = dc * g * i * (1.0 - i)
        dzf = dc * cprev * f * (1.0 - f)
        dzg = dc * i * (1.0 - g * g)
        dzo = dh * tanh_c * o * (1.0 - o)
        dz = jnp.concatenate([dzi, dzf, dzg, dzo], axis=1)
        dxw_ref[:, t, :] = dz
        # accumulate dW_h by read-modify-write ON THE REF: carrying the
        # (H, 4H) accumulator through fori_loop allocates in/out stack
        # copies (2 x 4.2 MB at H=512 — the OOM).  dot_general with
        # explicit contraction dims avoids materializing wh.T too.
        dwh_ref[:] = dwh_ref[:] + jax.lax.dot_general(
            hprev, dz, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dh_prev = jax.lax.dot_general(
            dz, wh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dc_prev = dc * f
        return (dh_prev, dc_prev)

    dh, dc = jax.lax.fori_loop(
        0, Tc, body, (dh_ref[:], dc_ref[:])
    )
    dh_ref[:] = dh
    dc_ref[:] = dc


def _recurrence_fwd_pallas(xw, w_h, chunk, b_blk, interpret):
    B, T, H4 = xw.shape
    H = H4 // 4
    grid = (B // b_blk, T // chunk)
    return pl.pallas_call(
        _lstm_fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (b_blk, chunk, H4), lambda b, t: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (H, H4), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (b_blk, chunk, H), lambda b, t: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (b_blk, chunk, H), lambda b, t: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, H), jnp.float32),
            jax.ShapeDtypeStruct((B, T, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_blk, H), jnp.float32),
            pltpu.VMEM((b_blk, H), jnp.float32),
        ],
        interpret=interpret,
    )(xw, w_h)


def _recurrence_bwd_pallas(xw, w_h, h_seq, c_seq, dy, chunk, b_blk,
                           interpret):
    B, T, H4 = xw.shape
    H = H4 // 4
    n = T // chunk
    grid = (B // b_blk, n)
    # reverse-time chunks within each batch block
    rev = lambda b, t: (b, n - 1 - t, 0)  # noqa: E731
    zrow = jnp.zeros((B, 1, H), xw.dtype)
    hprev = jnp.concatenate([zrow, h_seq[:, :-1]], axis=1)
    cprev = jnp.concatenate([zrow, c_seq[:, :-1]], axis=1)
    seq_spec = pl.BlockSpec((b_blk, chunk, H), rev, memory_space=pltpu.VMEM)
    dxw, dwh = pl.pallas_call(
        _lstm_bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (b_blk, chunk, H4), rev, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (H, H4), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
            seq_spec,  # hprev
            seq_spec,  # c
            seq_spec,  # cprev
            seq_spec,  # dy
        ],
        out_specs=[
            pl.BlockSpec(
                (b_blk, chunk, H4), rev, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (H, H4), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, H4), jnp.float32),
            jax.ShapeDtypeStruct((H, H4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_blk, H), jnp.float32),
            pltpu.VMEM((b_blk, H), jnp.float32),
        ],
        interpret=interpret,
    )(xw, w_h, hprev, c_seq, cprev, dy)
    return dxw, dwh


def trainable_auto_blocks(B: int, H: int, T: int,
                          budget: int = 10 * 1024 * 1024):
    """(chunk, b_blk) whose pallas working set fits the scoped VMEM
    budget for the TRAINABLE path.  The backward kernel is the binding
    constraint: it streams 12H f32 per (batch-row, step) — inputs
    xw(4H) + hprev/c/cprev/dy(H each) and the dxw(4H) output —
    double-buffered for grid pipelining, plus the resident W_h/dW_h
    (H,4H) pair and the (b_blk,H) carries.  Batch rows are independent,
    so b_blk shrinks (outer grid axis) until the time chunk can hold
    Mosaic's minimum 8 sublanes.  The v5e scoped-vmem limit is 16 MB;
    half is left for the compiler (measured: a 16.13 MB request is
    rejected at 16.00 MB)."""
    b_blk = 1 << (int(B).bit_length() - 1)  # largest power of two <= B
    b_blk = min(b_blk, B)
    while True:
        resident = 2 * H * 4 * H * 4 + 4 * b_blk * H * 4
        per_step = 2 * b_blk * 12 * H * 4
        chunk = max(1, (budget - resident) // per_step)
        chunk = 1 << (int(chunk).bit_length() - 1)
        chunk = min(chunk, T)
        if chunk >= 8 or b_blk <= 1:
            break
        b_blk //= 2
    # grid needs b_blk to divide B: fall back to a divisor
    while B % b_blk:
        b_blk //= 2
    return chunk, max(b_blk, 1)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def lstm_recurrence_trainable(xw, w_h, chunk: int = 256, b_blk: int = 8,
                              interpret: bool = False):
    """Differentiable pallas LSTM recurrence: forward emits h (and saves
    c for the reverse pass); the custom VJP runs the reverse-time BPTT
    kernel (gates recomputed, dW_h accumulated in VMEM).  Returns
    (B, T, H) hidden states like :func:`lstm_recurrence`."""
    h_seq, _ = _recurrence_fwd_pallas(xw, w_h, chunk, b_blk, interpret)
    return h_seq


def _lstm_trainable_fwd(xw, w_h, chunk, b_blk, interpret):
    h_seq, c_seq = _recurrence_fwd_pallas(xw, w_h, chunk, b_blk, interpret)
    return h_seq, (xw, w_h, h_seq, c_seq)


def _lstm_trainable_bwd(chunk, b_blk, interpret, res, dy):
    xw, w_h, h_seq, c_seq = res
    dxw, dwh = _recurrence_bwd_pallas(
        xw, w_h, h_seq, c_seq, dy, chunk, b_blk, interpret
    )
    return dxw, dwh


lstm_recurrence_trainable.defvjp(_lstm_trainable_fwd, _lstm_trainable_bwd)


def lstm_layer_pallas_trainable(x, cell_params, chunk: int | None = None,
                                b_blk: int | None = None,
                                interpret: bool = False):
    """Differentiable pallas LSTM layer (same contract as
    :func:`lstm_layer_pallas`): input projection as one large XLA matmul,
    recurrence + BPTT in pallas.  Gradients flow to ``x`` and every
    cell parameter (dW_x/db fall out of the dxw matmul via XLA).
    ``chunk=None`` picks the largest VMEM-fitting (chunk, b_blk)."""
    w_x, w_h, b = extract_flax_lstm_weights(cell_params)
    T = x.shape[1]
    B = x.shape[0]
    if chunk is None or b_blk is None:
        auto_c, auto_b = trainable_auto_blocks(B, w_h.shape[0], T)
        chunk = auto_c if chunk is None else chunk
        b_blk = auto_b if b_blk is None else b_blk
    chunk = min(chunk, T)
    while B % b_blk:
        b_blk //= 2
    pad = (-T) % chunk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    # the kernel refs are f32 (and an LSTM recurrence should carry f32
    # under AMP anyway — the bf16-carry scan was a measured quality bug,
    # CLAUDE.md); inputs/params may arrive bf16 from amp_cast
    in_dtype = x.dtype
    xw = (jnp.einsum("btc,ch->bth", x, w_x) + b[None, None, :]).astype(
        jnp.float32
    )
    ys = lstm_recurrence_trainable(
        xw, w_h.astype(jnp.float32), chunk, b_blk, interpret
    )
    ys = ys.astype(in_dtype)
    return ys[:, :T] if pad else ys


def extract_flax_lstm_weights(cell_params):
    """Concatenate flax OptimizedLSTMCell params into (W_x, W_h, b).

    flax layout: per-gate Dense kernels ``{i,f,g,o}`` for the input path and
    ``h{i,f,g,o}`` for the recurrent path (hi/hg/hf/ho carry the biases).
    """
    gates = ("i", "f", "g", "o")
    w_x = jnp.concatenate(
        [cell_params[f"i{g}"]["kernel"] for g in gates], axis=1
    )
    w_h = jnp.concatenate(
        [cell_params[f"h{g}"]["kernel"] for g in gates], axis=1
    )
    b = jnp.concatenate([cell_params[f"h{g}"]["bias"] for g in gates], axis=0)
    return w_x, w_h, b


def lstm_layer_pallas(x, cell_params, chunk: int = 256, interpret: bool = False):
    """Full LSTM layer via the pallas recurrence (unmasked; caller zeroes
    padded outputs — padding is at the sequence end for the forward pass
    and sequences are pre-reversed for the backward pass)."""
    w_x, w_h, b = extract_flax_lstm_weights(cell_params)
    T = x.shape[1]
    chunk = min(chunk, T)
    # pad T up to a chunk multiple instead of shrinking the chunk: an
    # awkward T (odd/prime) would otherwise degenerate the grid to
    # one-frame VMEM blocks
    pad = (-T) % chunk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    xw = jnp.einsum("btc,ch->bth", x, w_x) + b[None, None, :]
    ys = lstm_recurrence(xw, w_h, chunk=chunk, interpret=interpret)
    return ys[:, :T] if pad else ys
