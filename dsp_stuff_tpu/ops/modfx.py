"""Modulated fractional-delay effects (chorus / flanger / vibrato core).

Extension beyond the reference's 21 nodes (it has no chorus; BASELINE.json
config #2 calls for "ring-buffer delay lines with modulated fractional
taps").  TPU-first shape: the whole modulated tap is one vectorized gather —

    d[t]   = base + depth * sin(2*pi*rate*t/sr + phase0)     (samples)
    pos[t] = t - d[t]
    y[t]   = lerp(x[floor(pos)], x[floor(pos)+1], frac)      (linear interp)

with the history prefix carried as state so segments chain seamlessly.
No sequential loop anywhere: an LFO is closed-form in absolute time, so the
delay trajectory for a whole render materializes at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

TAU = 2.0 * np.pi


@jax.custom_batching.custom_vmap
def _frac_delay_gather(xx, i, frac):
    """Linear-interpolated fractional-delay read: xx 1-D, i/frac [T]."""
    a = jnp.take(xx, i, axis=0)
    b = jnp.take(xx, i + 1, axis=0)
    return a * (1.0 - frac) + b * frac


@_frac_delay_gather.def_vmap
def _frac_delay_gather_vmap(axis_size, in_batched, xx, i, frac):
    """Batched rule.  When the tap trajectory is SHARED across streams
    (scalar LFO params + the shared sample clock — the normal case), the
    read is a row gather in time-major layout: jnp.take(x.T, i, axis=0)
    pulls whole [streams] rows per index, which measured 12x faster on
    v5e than a per-element lane gather (2.6 s -> 0.2 s at [128, 480k]).
    Per-stream trajectories (modulated rate/mix) fall back to the general
    element gather."""
    xx_b, i_b, frac_b = in_batched
    if not i_b and not frac_b and xx_b and xx.ndim == 2:
        xt = xx.T                                  # [N, S]
        a = jnp.take(xt, i, axis=0)                # [T, S]
        b = jnp.take(xt, i + 1, axis=0)
        wet = a * (1.0 - frac[:, None]) + b * frac[:, None]
        return wet.T, True
    # general fallback: element gather along the last axis
    S = axis_size
    xxb = xx if xx_b else jnp.broadcast_to(xx, (S, *xx.shape))
    ib = i if i_b else jnp.broadcast_to(i, (S, *i.shape))
    fb = frac if frac_b else jnp.broadcast_to(frac, (S, *frac.shape))
    a = jnp.take_along_axis(xxb, ib, axis=-1)
    b = jnp.take_along_axis(xxb, ib + 1, axis=-1)
    return a * (1.0 - fb) + b * fb, True


def max_delay_samples(base_s: float, depth_s: float,
                      sample_rate: int = 48_000) -> int:
    """Static history length for a chorus line (structural param)."""
    return int(np.ceil((base_s + depth_s) * sample_rate)) + 2


def modulated_delay(x, rate_hz, depth_s, base_s, mix, hist, t0,
                    sample_rate: int = 48_000):
    """Apply a sine-modulated fractional delay along the last axis.

    x     -- [..., T] dry signal
    hist  -- [..., L] previous inputs (newest last; L = max_delay_samples)
    t0    -- absolute sample index of x[..., 0] (int32 scalar or [...]) for
             LFO phase continuity across segments
    Returns (y [..., T], new_hist, new_t0).
    """
    f32 = jnp.float32
    x = jnp.asarray(x, f32)
    T = x.shape[-1]
    L = hist.shape[-1]
    xx = jnp.concatenate([hist, x], axis=-1)               # [..., L+T]

    t0a = jnp.asarray(t0, jnp.int32)
    # [T] for a scalar clock (the shared/lockstep case), [..., T] otherwise
    t_abs = (t0a + jnp.arange(T) if t0a.ndim == 0
             else t0a[..., None] + jnp.arange(T))
    d = (jnp.asarray(base_s, f32) * sample_rate
         + jnp.asarray(depth_s, f32) * sample_rate
         * jnp.sin(f32(TAU) * jnp.asarray(rate_hz, f32)
                   * t_abs.astype(f32) / f32(sample_rate)))
    pos = (L + jnp.arange(T, dtype=f32)) - d               # index into xx
    pos = jnp.clip(pos, 0.0, L + T - 2)
    i = jnp.floor(pos).astype(jnp.int32)
    frac = pos - i.astype(f32)
    if xx.ndim == 1:
        wet = _frac_delay_gather(xx, i, frac)
    else:
        # explicit batch axes: vmap the custom-batched gather; the tap
        # trajectory rides unbatched (in_axes=None) when it is shared,
        # keeping the fast row-gather path
        iax = 0 if i.ndim == xx.ndim else None
        f = _frac_delay_gather
        for _ in range(xx.ndim - 1):
            f = jax.vmap(f, in_axes=(0, iax, iax))
        wet = f(xx, i, frac)
    mix = jnp.asarray(mix, f32)
    y = x * (1.0 - mix) + wet * mix
    new_hist = xx[..., -L:]
    new_t0 = jnp.asarray(t0, jnp.int32) + T
    return y, new_hist, new_t0
