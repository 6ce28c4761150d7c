"""Pallas TPU kernel: peak envelope follower (the non-associative scan).

The dasp-style detector  env' = d + gain(env<d) * (env - d)  has a
data-dependent coefficient, so unlike the linear filters it cannot be
reassociated — it is inherently one step per sample.  As an XLA scan that
costs ~1 us of while-loop overhead per sample (~0.5 s per 10 s render);
even unrolled it stays the slowest construct in a graph.  The Pallas
version runs the same sequential loop **on-chip**: time-major layout
[T, B] so each step is a handful of VPU ops on a [1, B] stream vector
held in registers, with the env carry in VMEM scratch across sequential
grid steps.  Batch (streams) rides the lane axis — the kernel is
batch-vectorized by construction, so it is NOT wrapped in vmap; the
Envelope node calls it with the full [B, T] block when available.

Opt-in with the rest of the Pallas paths (DST_PALLAS=1, TPU backends);
interpret mode keeps CPU tests honest.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLANES = 128       # streams per lane tile (batch padded up to a multiple)
STEPS = 1024       # samples per grid step


def _kernel(gains_ref, env0_ref, x_ref, out_ref, env_ref):
    """Grid step over [STEPS, BLANES] samples (time-major).

    Grid is (lane_blocks, time_blocks) with time innermost, so the env
    scratch sweeps a full time axis before the next lane block starts.

    gains_ref SMEM (1, 2): (attack_gain, release_gain)
    env0_ref  VMEM [1, BLANES]: initial envelope per stream
    x_ref     VMEM [1, STEPS, BLANES]
    env_ref   VMEM scratch [1, BLANES]: running envelope
    """
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        env_ref[:, :] = env0_ref[:, :]

    atk = gains_ref[0, 0]
    rel = gains_ref[0, 1]

    def step(t, env):                                  # env [1, BLANES]
        d = jnp.abs(x_ref[0, pl.ds(t, 1), :])          # [1, BLANES]
        gain = jnp.where(env < d, atk, rel)
        env = d + gain * (env - d)
        out_ref[0, pl.ds(t, 1), :] = env
        return env

    env = jax.lax.fori_loop(0, STEPS, step, env_ref[:, :])
    env_ref[:, :] = env


@functools.partial(jax.jit, static_argnames=("interpret",), inline=True)
def peak_envelope_pallas(x, attack_gain, release_gain, env0=0.0,
                        interpret: bool = False):
    """x [B, T] (or [T]) -> (env [B, T], final_env [B]).

    attack/release gains are the precomputed exp(-1/frames) values;
    env0 (scalar or [B]) seeds the carry, so segmented renders chain.
    """
    f32 = jnp.float32
    x = jnp.asarray(x, f32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    B, T = x.shape
    Bp = -(-B // BLANES) * BLANES
    K = -(-T // STEPS)
    xp = jnp.pad(x, ((0, Bp - B), (0, K * STEPS - T)))
    xt = xp.T.reshape(K, STEPS, Bp)                     # time-major blocks

    gains = jnp.stack([jnp.asarray(attack_gain, f32),
                       jnp.asarray(release_gain, f32)]).reshape(1, 2)
    env0b = jnp.zeros((Bp,), f32).at[:B].set(
        jnp.broadcast_to(jnp.asarray(env0, f32), (B,)))
    env0b = env0b.reshape(-1, BLANES)                   # [J, BLANES]

    J = Bp // BLANES
    with jax.enable_x64(False):     # see ops/pallas_scan.py: i64 index maps
        out = pl.pallas_call(
            _kernel,
            grid=(J, K),
            in_specs=[
                pl.BlockSpec((1, 2), lambda j, k: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, BLANES), lambda j, k: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, STEPS, BLANES), lambda j, k: (k, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, STEPS, BLANES),
                                   lambda j, k: (k, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K, STEPS, Bp), f32),
            scratch_shapes=[pltpu.VMEM((1, BLANES), f32)],
            interpret=interpret,
        )(gains, env0b, xt)
    env = out.reshape(K * STEPS, Bp).T[:B, :T]
    final = env[:, -1]
    if squeeze:
        return env[0], final[0]
    return env, final


# ---------------------------------------------------------------------------
# Chunk-parallel kernel: chunks ride the SUBLANE axis, streams the lanes.
#
# The plain kernel above advances one [1, BLANES] vector per on-chip step —
# T steps total.  The contraction argument (ops/envelope.py) lets T/chunk
# chunks run in parallel; putting 8 of them on the sublane axis makes every
# step a full [8, 128] vreg-pair op, so a pass over the whole signal costs
# only `chunk` steps per (chunk-group x lane-group) grid cell.  Two passes
# (guess, then correct) replace the T-step sequential sweep.
# ---------------------------------------------------------------------------

PSUB = 8           # chunks per sublane tile
TSTEP = 512        # time samples staged per grid step


def _chunk_kernel(emit: bool):
    def kernel(gains_ref, starts_ref, x_ref, *refs):
        """Grid (jb, jp, k): lane-group jb, chunk-group jp, time block k.

        gains_ref  SMEM (1, 2): (attack_gain, release_gain)
        starts_ref VMEM [PSUB, 128]: per-chunk initial envelopes
        x_ref      VMEM [TSTEP, PSUB, 128] (time-major chunk block)
        out_ref    VMEM [TSTEP, PSUB, 128] (emit only)
        fin_ref    VMEM [PSUB, 128]: final env per chunk
        env_ref    VMEM scratch [PSUB, 128]
        """
        if emit:
            out_ref, fin_ref, env_ref = refs
        else:
            fin_ref, env_ref = refs
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            env_ref[:, :] = starts_ref[:, :]

        atk = gains_ref[0, 0]
        rel = gains_ref[0, 1]

        def step(t, env):                              # env [PSUB, 128]
            d = jnp.abs(x_ref[t])
            gain = jnp.where(env < d, atk, rel)
            env = d + gain * (env - d)
            if emit:
                out_ref[t] = env
            return env

        env = jax.lax.fori_loop(0, TSTEP, step, env_ref[:, :])
        env_ref[:, :] = env
        fin_ref[:, :] = env
    return kernel


def _chunk_pass(xt, starts, gains, emit: bool, interpret: bool):
    """One pass over xt [chunk, P8, Bp] from starts [P8, Bp]."""
    chunk, P8, Bp = xt.shape
    K = chunk // TSTEP
    grid = (Bp // BLANES, P8 // PSUB, K)
    in_specs = [
        pl.BlockSpec((1, 2), lambda jb, jp, k: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((PSUB, BLANES), lambda jb, jp, k: (jp, jb),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TSTEP, PSUB, BLANES), lambda jb, jp, k: (k, jp, jb),
                     memory_space=pltpu.VMEM),
    ]
    fin_spec = pl.BlockSpec((PSUB, BLANES), lambda jb, jp, k: (jp, jb),
                            memory_space=pltpu.VMEM)
    fin_shape = jax.ShapeDtypeStruct((P8, Bp), jnp.float32)
    if emit:
        out_specs = (pl.BlockSpec((TSTEP, PSUB, BLANES),
                                  lambda jb, jp, k: (k, jp, jb),
                                  memory_space=pltpu.VMEM), fin_spec)
        out_shape = (jax.ShapeDtypeStruct((chunk, P8, Bp), jnp.float32),
                     fin_shape)
    else:
        out_specs, out_shape = fin_spec, fin_shape
    with jax.enable_x64(False):     # i64 index maps: see peak_envelope_pallas
        return pl.pallas_call(
            _chunk_kernel(emit), grid=grid, in_specs=in_specs,
            out_specs=out_specs, out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((PSUB, BLANES), jnp.float32)],
            interpret=interpret,
        )(gains, starts, xt)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"), inline=True)
def peak_envelope_pallas_chunked(x, attack_gain, release_gain, env0=0.0,
                                 chunk: int = 32768,
                                 interpret: bool = False):
    """Chunk-parallel two-pass envelope on TPU: x [B, T] -> (env, final).

    Same contraction-based algorithm as ops/envelope._chunked_batched (see
    there for the convergence bound), but the per-chunk scan runs on-chip:
    `2 * chunk` fori steps per lane/chunk-group instead of an XLA
    while-loop, each step one [8, 128] VPU op.
    """
    f32 = jnp.float32
    x = jnp.asarray(x, f32)
    B, T = x.shape
    assert chunk % TSTEP == 0
    P = -(-T // chunk)
    P8 = -(-P // PSUB) * PSUB
    Bp = -(-B // BLANES) * BLANES
    xp = jnp.pad(x, ((0, Bp - B), (0, P * chunk - T)))
    xt = jnp.pad(jnp.transpose(xp.reshape(Bp, P, chunk), (2, 1, 0)),
                 ((0, 0), (0, P8 - P), (0, 0)))          # [chunk, P8, Bp]

    gains = jnp.stack([jnp.asarray(attack_gain, f32),
                       jnp.asarray(release_gain, f32)]).reshape(1, 2)
    e0 = jnp.zeros((Bp,), f32).at[:B].set(
        jnp.broadcast_to(jnp.asarray(env0, f32), (B,)))
    starts = jnp.zeros((P8, Bp), f32).at[0].set(e0)

    finals = _chunk_pass(xt, starts, gains, emit=False, interpret=interpret)
    starts2 = jnp.concatenate([e0[None], finals[:-1]], axis=0)
    ys, _ = _chunk_pass(xt, starts2, gains, emit=True, interpret=interpret)
    env = jnp.transpose(ys[:, :P, :], (2, 1, 0)).reshape(Bp, P * chunk)
    env = env[:B, :T]
    return env, env[:, -1]
