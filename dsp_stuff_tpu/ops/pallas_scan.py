"""Pallas TPU kernel: constant-coefficient first-order IIR in one HBM pass.

The XLA blocked lowering (ops/scan.py:_first_order_blocked) is already
matmul-based, but it materializes the zero-state response, the chunk-end
vector, and the carry chain as separate HBM tensors — ~5 full passes over
the signal.  On TPU, Pallas grids execute **sequentially**, so the carry
can live in scratch across grid steps and the whole recurrence needs
exactly one read + one write of the signal:

  per grid step (R x 128 samples resident in VMEM):
    Z   = B @ Lt          zero-state of each 128-lane row   (MXU)
    e'  = zend' @ LtR     row-end carry chain, seeded by the running
                          scalar carry from the previous grid step (MXU)
    Y   = Z + c_r * a^(i+1)                                  (VPU)

Tap matrices Lt [128,128] (a^(i-j) lower-triangular) and LtR [R,R]
(a^(128(i-j)) lower-triangular) are computed once outside the kernel and
stay VMEM-resident.  Used automatically by first_order_affine under the
'fast' policy on TPU backends; interpret mode keeps CPU tests honest.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128      # samples per row (lane dim)
ROWS = 256       # rows per grid step -> 32768 samples per step


def _kernel(aC_ref, y0_ref, b_ref, lt_ref, ltr_ref, pows1_ref,
            out_ref, carry_ref):
    """One grid step: [ROWS, LANES] samples.

    aC_ref   SMEM (1,1): a^LANES
    y0_ref   SMEM (nb,1): initial conditions, indexed by grid dim 0
    b_ref    VMEM [ROWS, LANES]: forcing term block
    lt_ref   VMEM [LANES, LANES]: Lt[j, i] = a^(i-j), i >= j
    ltr_ref  VMEM [ROWS, ROWS]: LtR[i, j] = (a^LANES)^(i-j), i >= j
    pows1_ref VMEM [1, LANES]: a^(i+1)
    carry_ref SMEM scratch (1, 1): running last-sample carry
    """
    bidx = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        carry_ref[0, 0] = y0_ref[bidx, 0]

    s = carry_ref[0, 0]
    aC = aC_ref[0, 0]
    B = b_ref[0]                                           # [R, C]
    # zero-state response within each row
    Z = jnp.dot(B, lt_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    # row-end chain seeded with the running carry:
    # e'_r = aC e'_{r-1} + zend_r,  e'_{-1} = s.
    # Mosaic dislikes 1-lane matmul operands, so zend rides as a full
    # [R, LANES] tile (columns identical); the chain matmul then yields e
    # replicated across lanes, which is exactly the shape the final
    # carry-fold wants.  (masked add instead of .at[0].add — no scatter.)
    row = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
    zend = jnp.broadcast_to(Z[:, LANES - 1: LANES], (ROWS, LANES))
    zend_adj = zend + jnp.where(row == 0, aC * s, 0.0)
    e = jnp.dot(ltr_ref[:], zend_adj,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)       # [R, LANES], cols equal
    # carry INTO row r: c_0 = s, c_r = e'_{r-1}
    e_shift = jnp.concatenate(
        [jnp.zeros((1, LANES), jnp.float32), e[: ROWS - 1, :]], axis=0)
    c = jnp.where(row == 0, s, e_shift)                    # [R, LANES]
    Y = Z + c * pows1_ref[0, :].reshape(1, LANES)
    out_ref[0] = Y
    carry_ref[0, 0] = e[ROWS - 1, 0]


def _tap_matrices(a, R: int, C: int):
    """(aC, Lt [C,C], LtR [R,R], pows1 [1,C]) for scalar coefficient a."""
    f32 = jnp.float32
    a = jnp.asarray(a, f32)
    i = jnp.arange(C)
    pows = jnp.concatenate([jnp.ones((1,), f32),
                            jnp.cumprod(jnp.full((C,), a, f32))])
    Lt = jnp.where(i[:, None] <= i[None, :],
                   pows[jnp.clip(i[None, :] - i[:, None], 0, C)], 0.0)
    aC = pows[C]
    r = jnp.arange(R)
    powsR = jnp.concatenate([jnp.ones((1,), f32),
                             jnp.cumprod(jnp.full((R,), aC, f32))])
    # column orientation: e = LtR @ zend, LtR[i, j] = aC^(i-j) for i >= j
    LtR = jnp.where(r[:, None] >= r[None, :],
                    powsR[jnp.clip(r[:, None] - r[None, :], 0, R)], 0.0)
    return aC, Lt, LtR, pows[1:].reshape(1, C)


@functools.partial(jax.jit, static_argnames=("interpret",), inline=True)
def first_order_pallas(a, b, y0, interpret: bool = False):
    """y[t] = a*y[t-1] + b[t] along the last axis; a scalar, b [..., T].

    Pads T up to a ROWS*LANES multiple; batch dims fold into grid dim 0.
    """
    f32 = jnp.float32
    b = jnp.asarray(b, f32)
    T = b.shape[-1]
    batch = b.shape[:-1]
    nb = int(np.prod(batch)) if batch else 1
    step = ROWS * LANES
    K = -(-T // step)
    pad = K * step - T
    bp = jnp.pad(b.reshape(nb, T), ((0, 0), (0, pad)))
    bp = bp.reshape(nb, K * ROWS, LANES)

    y0b = jnp.broadcast_to(jnp.asarray(y0, f32), batch).reshape(nb, 1)

    aC, Lt, LtR, pows1 = _tap_matrices(a, ROWS, LANES)
    aC2 = aC.reshape(1, 1)

    # Trace the pallas_call with x64 disabled: the global jax_enable_x64
    # (precision.py needs it for parity-policy f64 scans) makes BlockSpec
    # index-map literals trace as i64, which Mosaic cannot legalize
    # ("func.return (i64, i64)").
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _kernel,
            grid=(nb, K),
            in_specs=[
                pl.BlockSpec((1, 1), lambda bidx, k: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((nb, 1), lambda bidx, k: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, ROWS, LANES), lambda bidx, k: (bidx, k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((LANES, LANES), lambda bidx, k: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROWS, ROWS), lambda bidx, k: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANES), lambda bidx, k: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, ROWS, LANES),
                                   lambda bidx, k: (bidx, k, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb, K * ROWS, LANES), f32),
            scratch_shapes=[pltpu.SMEM((1, 1), f32)],
            interpret=interpret,
        )(aC2, y0b, bp, Lt, LtR, pows1)
    y = out.reshape(nb, K * step)[:, :T].reshape(*batch, T)
    return y
