"""ctypes bindings for the native host runtime (native/dsp_host.cpp).

The compiled library provides the hot host-side paths — WAV decode/encode
with sample-format conversion, the 16-tap windowed-sinc resampler
(output-path analog of devices.rs:550-556), capture-path channel folding,
and a lock-free SPSC ring buffer (the rivulet analog).  Everything has a
pure-Python fallback (io/wav.py, io/resample.py), so the framework works
without a compiler; the native paths are used automatically when the
library is present (build with ``make -C native``, auto-attempted once on
first import when g++ is available).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO = os.path.join(_DIR, "libdsp_host.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        r = subprocess.run(["make", "-C", _DIR, "-s"], capture_output=True,
                           timeout=120)
        return r.returncode == 0 and os.path.exists(_SO)
    except Exception:
        return False


def load():
    """Returns the loaded library or None (after one build attempt)."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    c = ctypes
    lib.dsp_free.argtypes = [c.c_void_p]
    lib.dsp_wav_read.argtypes = [
        c.c_char_p, c.POINTER(c.POINTER(c.c_float)), c.POINTER(c.c_int32),
        c.POINTER(c.c_int64), c.POINTER(c.c_int32)]
    lib.dsp_wav_read.restype = c.c_int
    lib.dsp_wav_write.argtypes = [
        c.c_char_p, c.POINTER(c.c_float), c.c_int32, c.c_int64, c.c_int32,
        c.c_int32]
    lib.dsp_wav_write.restype = c.c_int
    lib.dsp_resample_sinc16.argtypes = [
        c.POINTER(c.c_float), c.c_int64, c.c_double,
        c.POINTER(c.POINTER(c.c_float))]
    lib.dsp_resample_sinc16.restype = c.c_int64
    lib.dsp_fold_interleaved_stereo.argtypes = [
        c.POINTER(c.c_float), c.POINTER(c.c_float), c.c_int64]
    lib.dsp_dup_to_stereo.argtypes = [
        c.POINTER(c.c_float), c.POINTER(c.c_float), c.c_int64]
    lib.dsp_ring_new.argtypes = [c.c_int64]
    lib.dsp_ring_new.restype = c.c_void_p
    lib.dsp_ring_free.argtypes = [c.c_void_p]
    for f in ("dsp_ring_read", "dsp_ring_write"):
        getattr(lib, f).argtypes = [c.c_void_p, c.POINTER(c.c_float), c.c_int64]
        getattr(lib, f).restype = c.c_int64
    for f in ("dsp_ring_readable", "dsp_ring_writable"):
        getattr(lib, f).argtypes = [c.c_void_p]
        getattr(lib, f).restype = c.c_int64
    lib.dsp_ring_drain.argtypes = [c.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


# -- high-level wrappers ------------------------------------------------------

def wav_read(path: str):
    """Native WAV decode -> ([ch, T] f32, rate).  Raises on failure."""
    lib = load()
    assert lib is not None
    data = ctypes.POINTER(ctypes.c_float)()
    n_ch = ctypes.c_int32()
    n_frames = ctypes.c_int64()
    rate = ctypes.c_int32()
    rc = lib.dsp_wav_read(path.encode(), ctypes.byref(data),
                          ctypes.byref(n_ch), ctypes.byref(n_frames),
                          ctypes.byref(rate))
    if rc != 0:
        raise ValueError(f"dsp_wav_read({path!r}) failed: rc={rc}")
    n = n_ch.value * n_frames.value
    arr = np.ctypeslib.as_array(data, shape=(n,)).copy()
    lib.dsp_free(data)
    return arr.reshape(n_ch.value, n_frames.value), rate.value


def wav_write(path: str, data, rate: int = 48_000, float_format=True):
    lib = load()
    assert lib is not None
    data = np.ascontiguousarray(np.atleast_2d(np.asarray(data, np.float32)))
    rc = lib.dsp_wav_write(
        path.encode(), data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        data.shape[0], data.shape[1], rate, 1 if float_format else 0)
    if rc != 0:
        raise ValueError(f"dsp_wav_write({path!r}) failed: rc={rc}")


def resample_sinc16(x, ratio: float):
    """16-tap windowed-sinc resample of a 1-D f32 signal by out/in ratio."""
    lib = load()
    assert lib is not None
    x = np.ascontiguousarray(np.asarray(x, np.float32))
    out = ctypes.POINTER(ctypes.c_float)()
    n = lib.dsp_resample_sinc16(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.size,
        float(ratio), ctypes.byref(out))
    if n < 0:
        raise ValueError("dsp_resample_sinc16 failed")
    arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
    lib.dsp_free(out)
    return arr


def dup_to_stereo(x):
    """Mono [n] f32 -> interleaved stereo [2n] (devices.rs:476-480)."""
    lib = load()
    assert lib is not None
    x = np.ascontiguousarray(np.asarray(x, np.float32))
    out = np.empty(2 * x.size, np.float32)
    lib.dsp_dup_to_stereo(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.size)
    return out


class Ring:
    """Lock-free SPSC ring buffer (rivulet analog; capacity in f32 samples).

    Semantics match the reference's failure modes: a full ring drops the
    excess on write (input overrun, devices.rs:239-241); a short read
    returns what exists and the caller zero-fills (output underrun,
    devices.rs:436-440); drain() implements the resync flush
    (runtime.rs:587-594)."""

    def __init__(self, capacity: int = 8192):   # runtime.rs:568 default
        self._lib = load()
        assert self._lib is not None
        self._h = self._lib.dsp_ring_new(capacity)
        if not self._h:
            raise MemoryError("dsp_ring_new failed")

    def write(self, x) -> int:
        x = np.ascontiguousarray(np.asarray(x, np.float32))
        return self._lib.dsp_ring_write(
            self._h, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.size)

    def read(self, n: int) -> np.ndarray:
        buf = np.empty(n, np.float32)
        got = self._lib.dsp_ring_read(
            self._h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
        return buf[:got]

    @property
    def readable(self) -> int:
        return self._lib.dsp_ring_readable(self._h)

    @property
    def writable(self) -> int:
        return self._lib.dsp_ring_writable(self._h)

    def drain(self) -> None:
        self._lib.dsp_ring_drain(self._h)

    def __del__(self):
        if getattr(self, "_h", None) and self._lib:
            self._lib.dsp_ring_free(self._h)
            self._h = None
