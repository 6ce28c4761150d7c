"""Polyphase oversampling wrappers for waveshapers (BASELINE config #3).

Nonlinear shapers generate harmonics above Nyquist that alias back down;
running them at 4x rate with band-limiting FIRs on both sides suppresses
that.  The reference has no oversampling (its Distort node aliases); this
is a TPU-first extension: both rate converters are polyphase FIRs expressed
as `lax.conv_general_dilated` calls, so up-shape-down compiles to three
fused convolution kernels with no sequential code.

    up:   y[R*t + p] = sum_k h[R*k + p] * x[t - k]      (R polyphase convs)
    down: z[t]       = sum_k h[k] * y[R*t - k]          (strided conv)

h is a Hann-windowed sinc low-pass at pi/R, length TAPS*R, gain R on the
upsampling side (to preserve amplitude through zero-stuffing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TAPS_PER_PHASE = 16


@functools.lru_cache(maxsize=None)
def _lowpass_kernel(R: int, taps_per_phase: int = TAPS_PER_PHASE):
    """Hann-windowed sinc low-pass at cutoff pi/R.

    Odd length (R*taps_per_phase + 1) so the group delay (N-1)/2 is an
    integer sample at the oversampled rate — an even kernel leaves a
    half-sample shift that survives the up/shape/down round trip as a
    fractional-sample phase error."""
    N = R * taps_per_phase + 1
    n = np.arange(N, dtype=np.float64) - (N - 1) / 2.0
    with np.errstate(invalid="ignore", divide="ignore"):
        h = np.where(np.abs(n) < 1e-12, 1.0 / R,
                     np.sin(np.pi * n / R) / (np.pi * n))
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(N) / (N - 1))
    h = h * w
    h /= h.sum() * 1.0          # unity DC gain at the base rate
    return h.astype(np.float32)


def _conv_same(x, h, stride: int = 1, lhs_dilation: int = 1):
    """Center-aligned conv along the last axis via conv_general_dilated.
    Output length: ceil(dilated_T / stride) with dilated_T = T*lhs_dilation
    (the zero-stuffed grid, tail-padded to a full dilation period)."""
    N = h.shape[0]
    batch = x.shape[:-1]
    flat = x.reshape((-1, 1, x.shape[-1]))
    kern = h[::-1].reshape((1, 1, N)).astype(x.dtype)
    pad = (N - 1) // 2
    out = jax.lax.conv_general_dilated(
        flat, kern, window_strides=(stride,),
        padding=[(pad, N - 1 - pad + lhs_dilation - 1)],
        lhs_dilation=(lhs_dilation,),
        dimension_numbers=("NCW", "OIW", "NCW"),
        preferred_element_type=x.dtype,
        precision=jax.lax.Precision.HIGHEST)
    return out.reshape((*batch, out.shape[-1]))


def upsample(x, R: int):
    """[..., T] -> [..., R*T]: zero-stuff + low-pass (gain-compensated)."""
    h = jnp.asarray(_lowpass_kernel(R) * R)
    return _conv_same(jnp.asarray(x, jnp.float32), h, lhs_dilation=R)


def downsample(x, R: int):
    """[..., R*T] -> [..., T]: low-pass + decimate."""
    h = jnp.asarray(_lowpass_kernel(R))
    return _conv_same(jnp.asarray(x, jnp.float32), h, stride=R)


def oversampled(fn, x, R: int, *args, **kwargs):
    """Run elementwise shaper ``fn(x, *args)`` at R-times rate.

    R == 1 is a passthrough.  Scalars in args broadcast; per-sample
    modulation arrays are upsampled alongside the signal (sample-and-hold
    would also be defensible; band-limited interpolation avoids zipper
    noise)."""
    if R == 1:
        return fn(x, *args, **kwargs)
    xu = upsample(x, R)
    up_args = tuple(
        upsample(a, R) if (hasattr(a, "ndim") and getattr(a, "ndim", 0) > 0
                           and a.shape[-1] == x.shape[-1]) else a
        for a in args)
    yu = fn(xu, *up_args, **kwargs)
    return downsample(yu, R)
