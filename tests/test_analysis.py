"""Analysis ops: spectrogram peak localization, McLeod pitch detection,
wave-view aux plumbing."""

import numpy as np
import pytest

import dsp_stuff_tpu as dst
from dsp_stuff_tpu.ids import IdSpace
from dsp_stuff_tpu.ops.fftspec import spectrogram
from dsp_stuff_tpu.ops.pitch_mpm import detect_pitch

SR = 48_000


def tone(freq, T, amp=0.5):
    return (amp * np.sin(2 * np.pi * freq * np.arange(T) / SR)
            ).astype(np.float32)


def test_spectrogram_peak_bin():
    x = tone(1000.0, 8192)
    freqs, cols = spectrogram(x, fft_size=1024)
    cols = np.asarray(cols)
    assert cols.shape[0] == 8                     # 8192 / 1024 frames
    peak_freqs = freqs[np.argmax(cols, axis=-1)]
    assert np.all(np.abs(peak_freqs - 1000.0) < SR / 1024 + 1)


def test_spectrogram_bounds():
    x = tone(15_000.0, 4096)
    freqs, cols = spectrogram(x, fft_size=1024, lower_hz=20, upper_hz=8000)
    assert freqs.max() <= 8000.0
    # the 15 kHz tone is outside the kept band: remaining energy is tiny
    assert float(np.max(np.asarray(cols))) < 1e-2


def test_spectrogram_exponential_positions():
    """PositionNormalisation::Exponential pins: endpoints at 0/1, strictly
    monotone, and the lower half of the frequency range occupies MORE than
    half of the display grid (the mode's defining property,
    spectrogram.rs:244)."""
    from dsp_stuff_tpu.ops.fftspec import exponential_positions, _kept_bins
    pos = exponential_positions(256)
    assert pos[0] == 0.0 and pos[-1] == 1.0
    assert np.all(np.diff(pos) > 0)
    freqs, keep = _kept_bins(1024, 20.0, 20_000.0, SR)
    mid_f = (freqs[keep][0] + freqs[keep][-1]) / 2
    n_low = (freqs[keep] <= mid_f).sum()
    grid_share = pos[n_low - 1]            # display share of the low half
    assert grid_share > 0.65, grid_share   # sqrt(0.5) ~ 0.707


def test_spectrogram_tone_lands_at_exponential_position():
    """A pure tone's interpolated column must peak at the grid index whose
    frequency is the tone's -- i.e. at the exponential position of its bin,
    not the linear one (pins bin placement, VERDICT r1 missing #4)."""
    from dsp_stuff_tpu.ops.fftspec import exponential_positions, _kept_bins
    f0 = 1000.0
    x = tone(f0, 4096)
    freqs_grid, cols = spectrogram(x, fft_size=1024)
    cols = np.asarray(cols)
    K = cols.shape[-1]
    # expected: position of the tone's bin among kept bins, scaled to K
    freqs, keep = _kept_bins(1024, 20.0, 20_000.0, SR)
    bin_i = int(np.argmin(np.abs(freqs[keep] - f0)))
    want_k = exponential_positions(keep.size)[bin_i] * (K - 1)
    got_k = int(np.argmax(cols[0]))
    assert abs(got_k - want_k) <= 2, (got_k, want_k)
    # and the linear position would be far away (the tone sits low)
    lin_k = bin_i / (keep.size - 1) * (K - 1)
    assert abs(got_k - lin_k) > 10, (got_k, lin_k)


def test_spectrogram_cubic_matrix_partition_of_unity():
    """Catmull-Rom weights sum to 1 on every output row (a constant
    spectrum interpolates to itself)."""
    from dsp_stuff_tpu.ops.fftspec import _catmull_rom_matrix
    W = _catmull_rom_matrix(333, 333)
    np.testing.assert_allclose(W.sum(axis=1), 1.0, atol=1e-5)
    W2 = _catmull_rom_matrix(100, 250)     # resolution upsampling
    np.testing.assert_allclose(W2.sum(axis=1), 1.0, atol=1e-5)


def test_spectrogram_window_deque_semantics():
    """Spectrogram.window reproduces the bounded deque at any tick
    (spectrogram.rs:255-262): after tick e the UI sees columns
    [max(0, e-n):e]."""
    from dsp_stuff_tpu.nodes.analysis import Spectrogram
    cols = np.arange(20, dtype=np.float32)[:, None] * np.ones(5, np.float32)
    params = {"buffer_size": 8}
    w = Spectrogram.window(cols, params, 12)
    np.testing.assert_array_equal(w[:, 0], np.arange(4, 12, dtype=np.float32))
    w = Spectrogram.window(cols, params, 3)      # buffer not yet full
    np.testing.assert_array_equal(w[:, 0], np.arange(3, dtype=np.float32))
    assert Spectrogram.window(cols, {"buffer_size": 0}, 12).shape[0] == 0


@pytest.mark.parametrize("freq", [110.0, 440.0, 1000.0])
def test_pitch_detection(freq):
    x = tone(freq, 8192, amp=0.8)
    res = detect_pitch(x, power_threshold=0.1, clarity_threshold=0.5,
                       pick_threshold=0.7)
    f = np.asarray(res["frequency"])
    voiced = np.asarray(res["voiced"])
    assert voiced.all(), res
    # MPM on a pure tone: well under 1% error
    assert np.all(np.abs(f - freq) / freq < 0.01), f


def test_pitch_rejects_noise_floor():
    x = (np.random.default_rng(0).standard_normal(4096) * 1e-4
         ).astype(np.float32)
    res = detect_pitch(x, power_threshold=0.5)
    assert not np.asarray(res["voiced"]).any()


def test_analysis_sinks_in_graph():
    """Spectrogram/pitch/wave-view nodes land in aux under cfg:id keys."""
    g = dst.Graph(IdSpace())
    inp = g.add("input")
    sp = g.add("spectrogram", fft_size=512)
    pt = g.add("pitch")
    wv = g.add("wave_view")
    for sink in (sp, pt, wv):
        g.connect(inp, "out", sink, "in")
    x = tone(440.0, 4096)
    outs, aux, _ = dst.render(g, {str(inp.id): x})
    assert f"spectrogram:{sp.id}" in aux
    assert f"pitch:{pt.id}" in aux
    assert f"wave_view:{wv.id}" in aux
    assert aux[f"wave_view:{wv.id}"]["samples"].shape == (4096,)
    pf = np.asarray(aux[f"pitch:{pt.id}"]["frequency"])
    assert np.all(np.abs(pf - 440.0) < 5.0)


def test_pitch_harmonic_rich():
    """Strong harmonics create nsdf ripples; key-max-per-interval picking
    must still land on the fundamental (not a sub-peak wiggle)."""
    T = 8192
    t = np.arange(T) / SR
    f0 = 220.0
    x = (0.5 * np.sin(2 * np.pi * f0 * t)
         + 0.45 * np.sin(2 * np.pi * 2 * f0 * t)
         + 0.4 * np.sin(2 * np.pi * 3 * f0 * t)).astype(np.float32)
    res = detect_pitch(x, power_threshold=0.1, clarity_threshold=0.5,
                       pick_threshold=0.85)
    f = np.asarray(res["frequency"])
    assert np.asarray(res["voiced"]).all()
    assert np.all(np.abs(f - f0) / f0 < 0.02), f


def test_wave_view_sweep_decimation():
    """The optional decimated oscilloscope view (wave_view.rs:70-123):
    per-frame sweep widths settle to the per-frame sample production via
    the 32-tap SMA, drawn samples are consumed in order, and a too-slow
    frame rate drops whole 128-blocks at the 4096 ring (no backlog)."""
    from dsp_stuff_tpu.nodes.analysis import WaveView
    T = 48_000
    x = np.arange(T, dtype=np.float32)          # ramp: order-checkable
    sweeps = WaveView.sweeps(x, fps=60.0)
    widths = [len(s) for s in sweeps]
    # steady state: 48000/60 = 800 samples per frame
    mid = widths[40:50]
    assert all(700 <= w <= 900 for w in mid), mid
    # drawn samples appear in stream order with no duplication
    drawn = np.concatenate([s for s in sweeps if len(s)])
    assert np.all(np.diff(drawn) > 0)
    assert drawn.size <= T
    # at 60 fps nothing overflows the 4096 ring: every sample is drawn
    assert drawn.size > 0.95 * T

    # 10 fps -> 4800 samples/frame production against a 4096 ring: blocks
    # MUST drop (the reference's audio thread throws them away)
    slow = WaveView.sweeps(x, fps=10.0)
    sdrawn = np.concatenate([s for s in slow if len(s)])
    assert sdrawn.size < 0.95 * T
    assert np.all(np.diff(sdrawn) > 0)          # still ordered, just gappy
