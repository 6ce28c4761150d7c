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
