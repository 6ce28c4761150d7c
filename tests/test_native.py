"""Native host runtime (native/dsp_host.cpp) vs the Python fallbacks."""

import os
import subprocess

import numpy as np
import pytest

from dsp_stuff_tpu.io import native, wav as wav_io
from dsp_stuff_tpu.io.resample import resample_sinc16 as resample_py

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_wav_roundtrip_native_vs_python(tmp_path):
    rng = np.random.default_rng(0)
    data = (rng.standard_normal((2, 4096)) * 0.5).astype(np.float32)
    p = str(tmp_path / "t.wav")
    native.wav_write(p, data, 48_000, float_format=True)
    got_n, rate_n = native.wav_read(p)
    got_p, rate_p = wav_io._read_wav_py(p)
    assert rate_n == rate_p == 48_000
    np.testing.assert_array_equal(got_n, data)
    np.testing.assert_array_equal(got_p, data)


@pytest.mark.parametrize("bits,fmt", [(16, False), (32, True)])
def test_wav_pcm_formats_cross(tmp_path, bits, fmt):
    rng = np.random.default_rng(1)
    data = (rng.standard_normal((1, 1000)) * 0.5).astype(np.float32)
    p = str(tmp_path / "t.wav")
    wav_io._write_wav_py(p, data, 48_000, float_format=fmt)
    got_n, _ = native.wav_read(p)
    got_p, _ = wav_io._read_wav_py(p)
    np.testing.assert_allclose(got_n, got_p, atol=1e-7)


def test_wav_truncated_data_chunk_clamped(tmp_path):
    """A data chunk whose declared size extends past EOF must decode only
    the bytes present (no OOB read), matching well-formed prefix frames."""
    rng = np.random.default_rng(2)
    data = (rng.standard_normal((1, 1000)) * 0.5).astype(np.float32)
    p = str(tmp_path / "t.wav")
    native.wav_write(p, data, 48_000, float_format=True)
    raw = open(p, "rb").read()
    open(p, "wb").write(raw[: len(raw) - 400])     # chop 100 samples
    got, rate = native.wav_read(p)
    assert rate == 48_000
    np.testing.assert_array_equal(got[0], data[0, :900])


def test_wav_zero_bits_rejected(tmp_path):
    """fmt with bits_per_sample == 0 (or non-multiple-of-8) must raise,
    not divide by zero."""
    rng = np.random.default_rng(3)
    data = (rng.standard_normal((1, 64)) * 0.5).astype(np.float32)
    p = str(tmp_path / "t.wav")
    native.wav_write(p, data, 48_000, float_format=True)
    raw = bytearray(open(p, "rb").read())
    i = raw.find(b"fmt ")
    assert i > 0
    raw[i + 8 + 14 : i + 8 + 16] = b"\x00\x00"     # bits field -> 0
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError):
        native.wav_read(p)


@pytest.mark.parametrize("ratio", [0.5, 44100 / 48000, 1.0, 2.0])
def test_resample_native_matches_numpy(ratio):
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(4096) * 0.5).astype(np.float32)
    got_n = native.resample_sinc16(x, ratio)
    got_p = resample_py(x, ratio)
    assert got_n.shape == got_p.shape
    np.testing.assert_allclose(got_n, got_p, atol=2e-7)


@pytest.mark.parametrize("ratio", [0.5, 44100 / 48000, 2.0])
def test_resample_jax_matches_numpy(ratio):
    from dsp_stuff_tpu.ops.resample import resample_sinc16 as resample_jax
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(4096) * 0.5).astype(np.float32)
    got_j = np.asarray(resample_jax(x, ratio))
    got_p = resample_py(x, ratio)
    # JAX taps are f32 (vs f64 accumulation in C++/NumPy)
    np.testing.assert_allclose(got_j, got_p, atol=5e-6)


def test_resample_tone_preserved():
    """A 1 kHz tone resampled 48k->44.1k must stay a 1 kHz tone."""
    sr_in, sr_out = 48_000, 44_100
    t = np.arange(sr_in, dtype=np.float64) / sr_in
    x = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    y = native.resample_sinc16(x, sr_out / sr_in)
    t2 = np.arange(y.size, dtype=np.float64) / sr_out
    want = np.sin(2 * np.pi * 1000.0 * t2).astype(np.float32)
    # ignore 16-tap warm-up edges
    err = np.abs(y[64:-64] - want[64:-64]).max()
    assert err < 5e-3, err


def test_ring_buffer_semantics():
    r = native.Ring(capacity=256)
    assert r.writable == 256 and r.readable == 0
    assert r.write(np.arange(100, dtype=np.float32)) == 100
    assert r.readable == 100
    got = r.read(40)
    np.testing.assert_array_equal(got, np.arange(40, dtype=np.float32))
    # overrun: writing more than fits drops the excess (devices.rs:239-241)
    wrote = r.write(np.zeros(500, np.float32))
    assert wrote == 256 - 60
    # underrun: short read returns what exists (devices.rs:436-440)
    got = r.read(1000)
    assert got.size == 256
    # resync drain (runtime.rs:587-594)
    r.write(np.ones(10, np.float32))
    r.drain()
    assert r.readable == 0


def test_ring_wraparound():
    r = native.Ring(capacity=64)
    for rep in range(10):
        x = np.full(48, float(rep), np.float32)
        assert r.write(x) == 48
        got = r.read(48)
        np.testing.assert_array_equal(got, x)
