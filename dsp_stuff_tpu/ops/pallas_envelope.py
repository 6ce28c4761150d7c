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


@functools.partial(jax.jit, static_argnames=("interpret",))
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
