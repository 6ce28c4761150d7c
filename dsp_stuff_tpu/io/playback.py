"""Composed device-rate output path (the devices.rs playback analog).

The reference's output callback chain is: rivulet source -> persistent
sinc-16 resampler 48 kHz -> device rate (devices.rs:550-556) -> mono
duplicated to both stereo slots (devices.rs:476-480), with underrun
silence and the graduated catch-up protocol.  This module supplies the
pieces the session layer composes:

* ``host_resample(x, ratio)`` -- one-shot whole-signal resample for file
  export (native C++ when built, NumPy fallback; both bit-identical);
* ``dup_to_stereo(x)`` -- mono -> interleaved stereo (native when built);
* ``StreamingSinc16`` -- callback-by-callback resampler with persistent
  tap history and fractional phase, so chained device-rate reads from
  ``StreamSession.drain_output`` reproduce the one-shot resample exactly.

Streaming semantics: output sample k is the 16-tap windowed-sinc
interpolation at input position t = k/ratio, evaluated with an 8-sample
input lookbehind window (indices floor(t)-15 .. floor(t)) -- i.e. a fixed
8-input-sample latency, the causal analog of dasp's ring-center
interpolation (the Converter's 16-frame ring interpolates between slots 7
and 8, devices.rs:550).  Chained produce() calls are bit-identical to
``resample_sinc16(concat(zeros(8), x), ratio)`` on the whole stream.
"""

from __future__ import annotations

import numpy as np

from dsp_stuff_tpu.io.resample import HALF, resample_sinc16, sinc16_taps

SAMPLE_RATE = 48_000


def host_resample(x, ratio: float) -> np.ndarray:
    """One-shot sinc-16 resample of a 1-D f32 signal by out/in ``ratio``
    on the host: native C++ when built, NumPy fallback otherwise (the two
    are bit-identical; tests cross-check them and the JAX op)."""
    from dsp_stuff_tpu.io import native
    if native.available():
        return native.resample_sinc16(x, ratio)
    return resample_sinc16(x, ratio)


def dup_to_stereo(x) -> np.ndarray:
    """Mono [n] -> interleaved stereo [2n] (devices.rs:476-480)."""
    from dsp_stuff_tpu.io import native
    x = np.ascontiguousarray(np.asarray(x, np.float32))
    if native.available():
        return native.dup_to_stereo(x)
    out = np.empty(2 * x.size, np.float32)
    out[0::2] = x
    out[1::2] = x
    return out


class StreamingSinc16:
    """Persistent-state sinc-16 resampler for the playback callback path.

    State: the last 16 consumed input samples (the tap lookbehind), the
    absolute count of consumed input, and the next absolute output index.
    The caller (StreamSession.drain_output) asks ``input_needed(n)``, pulls
    exactly that many samples from the ring, and calls ``produce``.
    """

    def __init__(self, device_rate: int, source_rate: int = SAMPLE_RATE):
        self.ratio = float(device_rate) / float(source_rate)
        if self.ratio <= 0:
            raise ValueError(f"bad device rate {device_rate}")
        self.k = 0              # next output sample index
        # VIRTUAL input count: samples consumed via produce().  Catch-up
        # skips drop physical samples without advancing this clock, so the
        # output timeline continues seamlessly onto the post-skip input
        # (the reference preps its converter with view[offs..] and the
        # fractional phase carries over, devices.rs:421-425).
        self.consumed = 0
        self.hist = np.zeros(2 * HALF, np.float32)   # last 16 seen inputs

    def input_needed(self, n: int) -> int:
        """Input samples required beyond ``consumed`` to emit n outputs.
        The reference's per-callback estimate is floor(n * 48000/rate)
        (devices.rs:401); this is the exact count its Converter would
        actually consume (release(source().index), devices.rs:434)."""
        if n <= 0:
            return 0
        i0_max = int(np.floor((self.k + n - 1) / self.ratio))
        return max(0, i0_max + 1 - self.consumed)

    def skip(self, samples) -> None:
        """Catch-up: drop a backlog while keeping tap-history continuity
        with the end of the skipped region.  The virtual clock does NOT
        advance — the next produce() splices the post-skip input onto the
        output timeline where the pre-skip input left off."""
        samples = np.asarray(samples, np.float32).ravel()
        joined = np.concatenate([self.hist, samples])
        self.hist = joined[-2 * HALF:].astype(np.float32)

    def produce(self, new_input, n: int) -> np.ndarray:
        """Consume ``input_needed(n)`` fresh samples, emit n output
        samples at the device rate."""
        new_input = np.asarray(new_input, np.float32).ravel()
        need = self.input_needed(n)
        if new_input.size != need:
            raise ValueError(f"expected {need} input samples, "
                             f"got {new_input.size}")
        if n <= 0:
            return np.zeros(0, np.float32)
        ext = np.concatenate([self.hist, new_input]).astype(np.float64)
        base = self.consumed - 2 * HALF       # absolute index of ext[0]
        t = (self.k + np.arange(n, dtype=np.float64)) / self.ratio
        i0 = np.floor(t).astype(np.int64)
        frac = t - i0
        taps = sinc16_taps(frac, self.ratio)               # [n, 16]
        m = np.arange(-HALF + 1, HALF + 1, dtype=np.int64)
        # the 8-sample-latency window: x[i0 + m - HALF]
        idx = i0[:, None] + m[None, :] - HALF - base
        # idx >= 0 by construction (see input_needed); guard the pre-stream
        # region (absolute index < 0 reads the zero-initialized history)
        gathered = ext[idx]
        out = (gathered * taps).sum(axis=1).astype(np.float32)
        self.k += n
        self.consumed += new_input.size
        joined = np.concatenate([self.hist, new_input])
        self.hist = joined[-2 * HALF:].astype(np.float32)
        return out
