"""McLeod Pitch Method (MPM) -- batch analog of the Pitch node.

The reference accumulates 1024-sample windows (hop 1024) in a ring and runs
``pitch_detection::McLeodDetector::new(1024, 512)`` with power/clarity/pick
thresholds (pitch.rs:115-147).  MPM computes the normalized square
difference function

    nsdf[tau] = 2 * acf[tau] / m[tau]
    acf[tau]  = sum_j x[j] * x[j+tau]
    m[tau]    = sum_j (x[j]^2 + x[j+tau]^2)

picks key maxima between positive-going zero crossings, takes the first
peak above ``pick_threshold * max_peak``, refines it with parabolic
interpolation, and reports frequency = sr / tau and clarity = peak value,
gated on signal power and clarity thresholds.

Everything is vectorized: acf via rFFT, peak picking via masked argmax, all
windows of all streams in parallel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def nsdf(x):
    """x [..., W] -> nsdf [..., W//2] via FFT autocorrelation."""
    W = x.shape[-1]
    nfft = 2 * W
    X = jnp.fft.rfft(x, nfft)
    acf = jnp.fft.irfft(X * jnp.conj(X), nfft)[..., : W // 2]
    # m[tau] = sum_{j=0}^{W-tau-1} x[j]^2 + x[j+tau]^2
    x2 = x * x
    c = jnp.cumsum(x2, axis=-1)
    total = c[..., -1:]
    tau = jnp.arange(W // 2)
    # sum_{j<W-tau} x[j]^2 = c[W-tau-1]; sum_{j>=tau} x[j]^2 = total - c[tau-1]
    head = jnp.take_along_axis(
        jnp.broadcast_to(c, (*x.shape[:-1], W)),
        jnp.broadcast_to(W - tau - 1, (*x.shape[:-1], W // 2)), axis=-1)
    cpad = jnp.concatenate([jnp.zeros_like(c[..., :1]), c], axis=-1)
    tail = total - jnp.take_along_axis(
        jnp.broadcast_to(cpad, (*x.shape[:-1], W + 1)),
        jnp.broadcast_to(tau, (*x.shape[:-1], W // 2)), axis=-1)
    m = head + tail
    return jnp.where(m > 0, 2.0 * acf / m, 0.0)


def detect_pitch(x, sample_rate: int = 48_000, power_threshold: float = 0.5,
                 clarity_threshold: float = 0.5, pick_threshold: float = 0.5,
                 window: int = 1024):
    """x [..., T] -> dict of per-window pitch tracks.

    Returns {"frequency": [..., n_win], "clarity": [..., n_win],
             "voiced": bool [..., n_win]} with hop == window (the node's
    read-1024 / release-1024 cycle, pitch.rs:120-139)."""
    T = x.shape[-1]
    n_win = T // window
    xw = x[..., : n_win * window].reshape(*x.shape[:-1], n_win, window)
    d = nsdf(xw)                                            # [..., n_win, W/2]
    W2 = d.shape[-1]

    # MPM key maxima: ONE candidate per interval between positive-going
    # zero crossings — the interval's maximum (taking every local max as a
    # candidate lets a sub-peak ripple win "first above threshold" and
    # report a sharp pitch).  Interval membership and maxima are computed
    # with segmented max scans (forward + backward), fully vectorized.
    rising = (d[..., 1:] > 0) & (d[..., :-1] <= 0)          # crossing before t+1
    started = jnp.cumsum(rising.astype(jnp.int32), axis=-1) > 0
    dpad = d[..., 1:]

    def seg_combine(l, r):
        fl, ml = l
        fr, mr = r
        return fl | fr, jnp.where(fr, mr, jnp.maximum(ml, mr))

    # forward: running max since the interval start
    _, fwd = jax.lax.associative_scan(seg_combine, (rising, dpad), axis=-1)
    # backward: running max to the interval end (an interval ends where the
    # next sample starts a new one, or at the array tail)
    ends = jnp.concatenate(
        [rising[..., 1:], jnp.ones_like(rising[..., :1])], axis=-1)
    _, bwd_r = jax.lax.associative_scan(
        seg_combine, (ends[..., ::-1], dpad[..., ::-1]), axis=-1)
    bwd = bwd_r[..., ::-1]
    region_max = jnp.maximum(fwd, bwd)

    is_peak = jnp.zeros_like(dpad, dtype=bool)
    interior = (dpad[..., 1:-1] > dpad[..., :-2]) & (dpad[..., 1:-1] >= dpad[..., 2:])
    is_peak = is_peak.at[..., 1:-1].set(interior)
    is_peak = is_peak & started & (dpad == region_max)

    neg_inf = jnp.float32(-np.inf)
    peaks = jnp.where(is_peak, dpad, neg_inf)
    max_peak = jnp.max(peaks, axis=-1, keepdims=True)
    thresh = pick_threshold * max_peak
    candidates = jnp.where(peaks >= thresh, peaks, neg_inf)
    # first qualifying peak
    first_idx = jnp.argmax(candidates > neg_inf, axis=-1)
    tau0 = first_idx + 1                                     # offset from slice
    val = jnp.take_along_axis(d, tau0[..., None], axis=-1)[..., 0]

    # parabolic interpolation around tau0
    tm = jnp.clip(tau0 - 1, 0, W2 - 1)
    tp = jnp.clip(tau0 + 1, 0, W2 - 1)
    ym = jnp.take_along_axis(d, tm[..., None], axis=-1)[..., 0]
    yp = jnp.take_along_axis(d, tp[..., None], axis=-1)[..., 0]
    denom = ym - 2.0 * val + yp
    shift = jnp.where(jnp.abs(denom) > 1e-12,
                      0.5 * (ym - yp) / denom, 0.0)
    tau_ref = tau0.astype(jnp.float32) + shift
    freq = jnp.float32(sample_rate) / jnp.maximum(tau_ref, 1.0)

    power = jnp.sum(xw * xw, axis=-1)
    has_peak = jnp.any(is_peak, axis=-1)
    voiced = has_peak & (power >= power_threshold) & (val >= clarity_threshold)
    freq_out = jnp.where(voiced, freq, 0.0)
    return {"frequency": freq_out,
            "clarity": jnp.where(voiced, val, 0.0),
            "voiced": voiced,
            "note_nr": jnp.where(voiced, freq_to_note_nr(freq_out), 0)}


# -- note-name readout (the reference's instrument display) -------------------
#
# pitch.rs:61-74 maps frequency -> rust-music-theory Note:
#     note_nr(Note) = pitch_class u8 + 12 * octave      (C = 0 .. B = 11)
#     freq_to_note(f) = from_note_nr(
#         ((12 * log2(f / 440)) as i16 + 57) as u8)     (A4 = nr 57)
# Two quirks are load-bearing for parity: the Rust `as i16` cast TRUNCATES
# TOWARD ZERO (466.16 Hz is +99.97 cents above A4 and still displays "A 4";
# only >= +100 cents reaches A#), and the `as u8` cast wraps mod 256 for
# sub-16.35 Hz detections.  ``nearest=True`` is the extension musicians
# expect (round to the closest note + signed cent offset).

NOTE_NAMES = ("C", "C#", "D", "D#", "E", "F",
              "F#", "G", "G#", "A", "A#", "B")
_A4_NR = 57        # note_nr(Note::new(PitchClass::A, 4)), pitch.rs:72


def freq_to_note_nr(freq, nearest: bool = False):
    """freq [..] -> note number (C0 = 0, A4 = 57), reference semantics.

    jit-safe.  freq <= 0 maps to 0 (callers mask with ``voiced``)."""
    freq = jnp.asarray(freq)
    safe = jnp.where(freq > 0, freq, 440.0)
    steps = 12.0 * jnp.log2(safe / 440.0)
    stepi = jnp.round(steps) if nearest else jnp.trunc(steps)
    nr = stepi.astype(jnp.int32) + _A4_NR
    nr = jnp.where(jnp.asarray(freq) > 0, nr & 0xFF, 0)   # the u8 wrap
    return nr


def note_name(nr) -> str:
    """Note number -> the display string of pitch.rs:84 ("A 4")."""
    nr = int(nr)
    return f"{NOTE_NAMES[nr % 12]} {nr // 12}"


def describe_pitch(freq, nearest: bool = False):
    """Host-side readout for one frequency: (name, octave, cents).

    ``cents`` is the signed offset of ``freq`` from the reported note
    (for the default truncating map it lies in (-100, 100); with
    ``nearest=True`` in [-50, 50])."""
    freq = float(freq)
    if freq <= 0:
        return ("", 0, 0.0)
    nr = int(freq_to_note_nr(np.float64(freq), nearest=nearest))
    cents = 1200.0 * np.log2(freq / 440.0) - 100.0 * (nr - _A4_NR)
    return (f"{NOTE_NAMES[nr % 12]} {nr // 12}", nr // 12, float(cents))
