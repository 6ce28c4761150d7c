"""Peak envelope follower (dasp_envelope semantics).

The reference Envelope node (envelope.rs:43-51) wraps
``dasp_envelope::Detector<f32, Peak<FullWave>>`` with attack/release frame
counts set every block.  dasp's detector computes, per sample:

    d     = |x|                                   (full-wave rectify)
    gain  = attack_gain  if env < d  else release_gain
    env'  = d + gain * (env - d)

with ``gain_from_frames(n) = exp(-1/n)`` and ``0.0`` when n == 0.

The branch on ``env < d`` makes the recurrence non-associative (the
coefficient depends on the running state), so unlike the linear filters it
cannot lower to an associative scan; it runs as a `lax.scan` over samples,
vectorized across the batch/stream axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gain_from_frames(frames):
    """exp(-1/frames); 0 when frames == 0 (dasp_envelope calc_gain)."""
    frames = jnp.asarray(frames, jnp.float32)
    safe = jnp.where(frames == 0.0, 1.0, frames)
    return jnp.where(frames == 0.0, 0.0, jnp.exp(-1.0 / safe))


import functools


@functools.partial(jax.jit)
def peak_envelope(x, attack_frames=0.0, release_frames=0.0, env0=0.0):
    """Full-wave peak detection along the last axis.

    Returns (env [..., T] f32, final_env).
    """
    f32 = jnp.float32
    x = jnp.asarray(x, f32)
    atk = gain_from_frames(attack_frames)
    rel = gain_from_frames(release_frames)
    env0 = jnp.broadcast_to(jnp.asarray(env0, f32), x.shape[:-1])

    def step(env, xt):
        d = jnp.abs(xt)
        gain = jnp.where(env < d, atk, rel)
        env = d + gain * (env - d)
        return env, env

    # the data-dependent branch makes this recurrence non-associative, so
    # it stays a per-sample scan; unrolling amortizes the XLA while-loop
    # per-iteration overhead (~1 us/sample otherwise — the single slowest
    # construct in a graph containing an Envelope node)
    final, ys = jax.lax.scan(step, env0, jnp.moveaxis(x, -1, 0), unroll=32)
    return jnp.moveaxis(ys, 0, -1), final
