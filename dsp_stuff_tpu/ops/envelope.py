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


def _use_pallas() -> bool:
    from dsp_stuff_tpu.ops.scan import _use_pallas as _up
    return _up()


@jax.custom_batching.custom_vmap
def _env_pallas_cv(x, env0, atk, rel):
    """Dispatch point so vmapped (per-stream) callers reach the Pallas
    kernel with the WHOLE batch riding the lane axis (the kernel is
    batch-vectorized by construction, ops/pallas_envelope.py)."""
    from dsp_stuff_tpu.ops.pallas_envelope import peak_envelope_pallas
    return peak_envelope_pallas(x, atk, rel, env0)


@_env_pallas_cv.def_vmap
def _env_pallas_cv_vmap(axis_size, in_batched, x, env0, atk, rel):
    from dsp_stuff_tpu.ops.pallas_envelope import peak_envelope_pallas
    x_b, env0_b, atk_b, rel_b = in_batched
    if atk_b or rel_b or not x_b or x.ndim != 2:
        # per-stream gains, nested batching, or a closed-over unbatched
        # signal: no efficient lane mapping — tell the caller to use the
        # scan path rather than silently mis-shaping the kernel input
        raise NotImplementedError(
            "pallas envelope: per-stream attack/release, unbatched signal "
            "or nested batching not supported; unset DST_PALLAS here")
    S = axis_size
    e0 = env0 if env0_b else jnp.broadcast_to(env0, (S,))
    env, fin = peak_envelope_pallas(x, atk, rel, e0)
    return (env, fin), (True, True)


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
    if _use_pallas() and x.ndim <= 2 and atk.ndim == 0 and rel.ndim == 0:
        return _env_pallas_cv(x, env0, atk, rel)

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
