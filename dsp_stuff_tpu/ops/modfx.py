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
    # LFO phase in f64 fractional cycles, reduced mod 1 BEFORE the f32 sin:
    # a raw f32 sample clock quantizes past 2^24 samples (~6 min at 48 kHz)
    # and an unreduced argument loses precision as it grows -- the reduced
    # phase stays in [0, 1) with full precision for arbitrarily long
    # streams (t_abs is exact in f64 up to 2^53)
    cycles = (jnp.asarray(rate_hz, jnp.float64)
              * t_abs.astype(jnp.float64) / sample_rate)
    phase = (cycles - jnp.floor(cycles)).astype(f32)
    # LFO sin precision is policy-dependent (read at trace time, like the
    # recurrence lowerings): under parity/exact the f32 argument evaluates
    # through f64 sin and rounds back (the oracle's <=1-ulp transcendental
    # convention; a native f32 sin's ~1-ulp slack, scaled by depth*sr and
    # the signal slope, costs ~-92 dBFS per chorus — too close to the -90
    # graph budget).  fast keeps the cheap f32 sin.
    from dsp_stuff_tpu.utils import precision
    arg = f32(TAU) * phase
    if precision.get_policy().name == "fast":
        s = jnp.sin(arg)
        d = (jnp.asarray(base_s, f32) * sample_rate
             + jnp.asarray(depth_s, f32) * sample_rate * s)
    else:
        # XLA contracts (depth*sr*s) + base*sr into a single-rounding fma,
        # moving the f32 trajectory by 1 ulp (~6e-5 samples at d~576) --
        # which the interpolated tap turns into ~-88 dBFS of wet error,
        # above the parity budget.  An f32->f32 reduce_precision fence does
        # NOT stop it (it is an identity the simplifier sees through);
        # precision.mul_unfused computes the product in f64 and rounds it
        # onto the f32 grid, which is bit-identical to an unfused f32
        # multiply and cannot be contracted.
        from dsp_stuff_tpu.utils.precision import mul_unfused
        s = jnp.sin(arg.astype(jnp.float64)).astype(f32)
        sweep = mul_unfused(jnp.asarray(depth_s, f32) * sample_rate, s)
        d = jnp.asarray(base_s, f32) * sample_rate + sweep
    # pos in f64: offline and streaming evaluate the same tap at offsets
    # differing by an exact integer (the segment start), so a double
    # subtraction keeps i/frac bit-identical across segmentations —
    # in f32 the differing magnitudes round frac differently (~2e-5 wet
    # error at block boundaries)
    pos = (L + jnp.arange(T, dtype=jnp.float64)) - d.astype(jnp.float64)
    pos = jnp.clip(pos, 0.0, L + T - 2)
    i = jnp.floor(pos).astype(jnp.int32)
    frac = (pos - jnp.floor(pos)).astype(f32)
    if i.ndim == 1:
        # shared tap trajectory (scalar LFO params + the lockstep sample
        # clock — the normal case): plain fancy indexing with UNBATCHED
        # indices.  Under the compiler's per-stream vmap this lowers to an
        # operand-batched gather (whole stream rows per index), measured
        # 12x faster on v5e than the explicitly-broadcast per-element
        # gather below (0.2 s vs 2.6 s at [128, 480k]) — and unlike a
        # custom_vmap wrapper it stays differentiable for train/fit.
        a = xx[..., i]
        b = xx[..., i + 1]
    else:
        # per-stream trajectories (modulated rate or per-stream clocks)
        ib = jnp.broadcast_to(i, (*xx.shape[:-1], T))
        a = jnp.take_along_axis(xx, ib, axis=-1)
        b = jnp.take_along_axis(xx, ib + 1, axis=-1)
    wet = a * (1.0 - frac) + b * frac
    mix = jnp.asarray(mix, f32)
    y = x * (1.0 - mix) + wet * mix
    new_hist = xx[..., -L:]
    new_t0 = jnp.asarray(t0, jnp.int32) + T
    return y, new_hist, new_t0
