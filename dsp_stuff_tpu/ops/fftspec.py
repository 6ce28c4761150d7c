"""Spectrogram computation (batch analog of the Spectrogram node).

The reference node reads ``fft_size`` fresh samples per tick (no overlap),
runs them through audioviz's spectrum Processor at 48 kHz with frequency
bounds, Mixture volume normalisation, exponential position distribution and
cubic interpolation (spectrogram.rs:225-269), and keeps the last
``buffer_size`` columns for drawing.

Offline we return the full waterfall as arrays instead of drawing it.  The
audioviz pipeline is approximated (documented divergence -- this node is a
visual instrument; the north-star parity target covers audio outputs):

* frames: non-overlapping windows of ``fft_size`` (matching the tick size)
* spectrum: |rfft| / fft_size, bins clipped to [lower, upper] Hz
* volume normalisation: sqrt-ish "Mixture" curve approximated by
  v -> v * sqrt(freq) scaling audioviz applies in Mixture mode
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def spectrogram(x, fft_size: int = 512, lower_hz: float = 20.0,
                upper_hz: float = 20_000.0, sample_rate: int = 48_000):
    """x [..., T] -> (freqs [K], columns [..., n_frames, K])."""
    T = x.shape[-1]
    n_frames = T // fft_size
    xb = x[..., : n_frames * fft_size].reshape(
        *x.shape[:-1], n_frames, fft_size)
    spec = jnp.abs(jnp.fft.rfft(xb, axis=-1)) / fft_size
    freqs = np.fft.rfftfreq(fft_size, 1.0 / sample_rate)
    mask = (freqs >= lower_hz) & (freqs <= upper_hz)
    keep = np.nonzero(mask)[0]
    spec = spec[..., keep]
    # audioviz Mixture volume normalisation boosts high bins ~ sqrt(freq)
    boost = jnp.sqrt(jnp.asarray(np.maximum(freqs[keep], 1.0), jnp.float32))
    spec = spec * boost / jnp.sqrt(jnp.float32(sample_rate / 2.0))
    return np.asarray(freqs[keep], np.float32), spec
