"""Private-jax-API fallback paths (VERDICT r3 weakness #6).

Two perf-critical heuristics ride private JAX internals:

* ops/scan._inside_trace -> jax._src.core.trace_state_clean
* ops/modfx._vmap_batch_size -> BatchTracer internals

Both have documented correct-but-slower fallbacks; these tests FORCE the
fallback branches (by monkeypatching the private APIs away) and assert
numerical equality with the primary path, so a jax upgrade that silently
moves the internals lands on a TESTED lowering instead of an untested one.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsp_stuff_tpu.ops import modfx, scan
from dsp_stuff_tpu.utils import precision


def _render_first_order(T=4096):
    rng = np.random.default_rng(11)
    b = (rng.standard_normal(T) * 0.5).astype(np.float32)
    with precision.policy("fast"):
        inside = jax.jit(lambda b: scan.first_order_affine(0.6, b, 0.25))(b)
        eager = scan.first_order_affine(0.6, b, 0.25)
    return np.asarray(inside), np.asarray(eager)


def test_inside_trace_fallback_matches_primary(monkeypatch):
    """With trace_state_clean gone, _inside_trace probes via a trial
    computation; the selected lowerings must produce identical values."""
    want_in, want_eager = _render_first_order()

    # the primary API must still exist (else promote the fallback)
    assert callable(scan._trace_state_clean_fn())

    def gone():
        raise AttributeError("simulated jax upgrade: private API moved")

    monkeypatch.setattr(scan, "_trace_state_clean_fn", gone)
    # the fallback must actually be reachable and classify both contexts
    assert scan._inside_trace() is False
    assert bool(jax.jit(lambda: jnp.asarray(scan._inside_trace()))())

    got_in, got_eager = _render_first_order()
    np.testing.assert_array_equal(got_in, want_in)
    np.testing.assert_array_equal(got_eager, want_eager)


def test_vmap_batch_size_fallback_takes_gather(monkeypatch):
    """With the batching internals unimportable, _vmap_batch_size returns
    the conservative huge default, forcing the (equally correct, bitwise-
    identical) operand-batched gather lowering."""
    rng = np.random.default_rng(12)
    T = 128 * 80
    rate, depth, base = 0.8, 0.004, 0.012
    L = modfx.max_delay_samples(base, depth)
    x = (rng.standard_normal(T) * 0.5).astype(np.float32)
    hist = (rng.standard_normal(L) * 0.3).astype(np.float32)

    with precision.policy("fast"):
        assert modfx._barrel_plan(rate, depth, base, L, T, 48_000)
        y_pri, h_pri, _ = modfx.modulated_delay(
            x, rate, depth, base, 0.5, hist, 0)

    def gone():
        raise ImportError("simulated jax upgrade: batching internals moved")

    monkeypatch.setattr(modfx, "_batching_module", gone)
    assert modfx._vmap_batch_size(jnp.zeros(())) == 1 << 30

    calls = []
    orig = modfx._barrel_taps
    monkeypatch.setattr(modfx, "_barrel_taps",
                        lambda *a, **k: calls.append(1) or orig(*a, **k))
    with precision.policy("fast"):
        y_fb, h_fb, _ = modfx.modulated_delay(
            x, rate, depth, base, 0.5, hist, 0)
    assert not calls, "fallback must route to the gather path"
    np.testing.assert_array_equal(np.asarray(y_fb), np.asarray(y_pri))
    np.testing.assert_array_equal(np.asarray(h_fb), np.asarray(h_pri))


def test_vmap_batch_size_unknown_tracer_is_conservative():
    """Any tracer type the walker does not recognize must yield the huge
    default (ADVICE r3: a future jax hiding batching behind an unknown
    tracer must not engage the barrel path's B x 11 MB window frames)."""

    class WeirdTracer(jax.core.Tracer):
        def __init__(self):   # bypass jax.core.Tracer's __init__ contract
            pass

        @property
        def aval(self):
            return jax.core.ShapedArray((), jnp.float32)

    assert modfx._vmap_batch_size(WeirdTracer()) == 1 << 30


def test_freeze_params_handles_jax_arrays():
    """_freeze_params must coerce jax arrays like np.ndarray: a raw
    non-scalar jax.Array in the key tuple makes != comparisons raise
    'truth value is ambiguous' instead of retracing (ADVICE r3)."""
    from dsp_stuff_tpu.runtime.stream import _freeze_params
    k1 = _freeze_params({"3": {"taps": jnp.asarray([1.0, 2.0],
                                                   jnp.float32)}})
    k2 = _freeze_params({"3": {"taps": np.asarray([1.0, 2.0],
                                                  np.float32)}})
    assert k1 == k2
    k3 = _freeze_params({"3": {"taps": jnp.asarray([1.0, 2.5],
                                                   jnp.float32)}})
    assert k1 != k3                      # must not raise
    assert hash(k1) is not None
    # scalars keep working
    assert _freeze_params({"3": {"g": 2.0}}) == (("3", (("g", 2.0),)),)
