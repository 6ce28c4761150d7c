"""The chorus barrel-shift gather-free lowering (ops/modfx._barrel_taps).

Contract: for smooth shared tap trajectories it returns values
BIT-IDENTICAL to the plain gather lowering, under every policy, batched
or not, for any T (padding path included).  The plan gate must refuse
traced params, fast/deep LFOs (residual bound), near-zero delays (pos
clipping), and short renders.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsp_stuff_tpu.ops import modfx
from dsp_stuff_tpu.utils import precision


def _both_paths(x, rate, depth, base, mix, hist, t0, monkeypatch):
    y1 = modfx.modulated_delay(x, rate, depth, base, mix, hist, t0)
    monkeypatch.setattr(modfx, "_vmap_batch_size", lambda _: 1 << 20)
    y2 = modfx.modulated_delay(x, rate, depth, base, mix, hist, t0)
    monkeypatch.undo()
    return y1, y2


@pytest.mark.parametrize("policy", ["fast", "parity"])
@pytest.mark.parametrize("rate,depth,base,T", [
    (0.8, 0.004, 0.012, 128 * 80),       # config2 parameters
    (2.5, 0.002, 0.020, 20_000),
    (0.3, 0.010, 0.030, 9_001),          # T not a frame multiple
])
def test_barrel_bitwise_vs_gather(policy, rate, depth, base, T,
                                  monkeypatch):
    rng = np.random.default_rng(1)
    L = modfx.max_delay_samples(base, depth)
    x = (rng.standard_normal(T) * 0.5).astype(np.float32)
    hist = (rng.standard_normal(L) * 0.3).astype(np.float32)
    with precision.policy(policy):
        assert modfx._barrel_plan(rate, depth, base, L, T, 48_000)
        (y1, h1, _), (y2, h2, _) = _both_paths(
            x, rate, depth, base, 0.5, hist, 12_345, monkeypatch)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))


def test_barrel_under_vmap_matches_unbatched():
    rng = np.random.default_rng(2)
    B, T = 4, 128 * 100
    rate, depth, base = 0.8, 0.004, 0.012
    L = modfx.max_delay_samples(base, depth)
    xb = (rng.standard_normal((B, T)) * 0.5).astype(np.float32)
    hb = (rng.standard_normal((B, L)) * 0.3).astype(np.float32)
    with precision.policy("fast"):
        f = lambda x, h: modfx.modulated_delay(
            x, rate, depth, base, 0.5, h, 7)
        yv, _, _ = jax.vmap(f)(xb, hb)
        for bi in range(B):
            ye, _, _ = f(xb[bi], hb[bi])
            np.testing.assert_array_equal(np.asarray(yv[bi]),
                                          np.asarray(ye))


def test_barrel_is_differentiable():
    rng = np.random.default_rng(3)
    T = 128 * 80
    rate, depth, base = 0.8, 0.004, 0.012
    L = modfx.max_delay_samples(base, depth)
    x = (rng.standard_normal(T) * 0.5).astype(np.float32)
    hist = np.zeros(L, np.float32)
    with precision.policy("fast"):
        def loss(x, mix):
            y, _, _ = modfx.modulated_delay(x, rate, depth, base, mix,
                                            hist, 0)
            return jnp.sum(y * y)
        gx, gm = jax.grad(loss, argnums=(0, 1))(x, jnp.float32(0.5))
    assert np.isfinite(np.asarray(gx)).all()
    assert np.isfinite(float(gm))


def test_barrel_plan_gates():
    plan = modfx._barrel_plan
    L = modfx.max_delay_samples(0.012, 0.004)
    # traced param -> None
    tr = jax.make_jaxpr(lambda r: jnp.asarray(
        plan(r, 0.004, 0.012, L, 48_000, 48_000) is None))(0.8)
    del tr  # (tracing through the gate itself is exercised via the jaxpr)
    assert plan(0.8, 0.004, 0.012, L, 4_000, 48_000) is None    # short T
    # deep+fast LFO: residual bound blown
    assert plan(10.0, 0.02, 0.03, modfx.max_delay_samples(0.03, 0.02),
                48_000, 48_000) is None
    # near-zero delay: pos clip could bind
    assert plan(0.8, 0.0, 0.00002, modfx.max_delay_samples(0.00002, 0.0),
                48_000, 48_000) is None
    # the canonical case holds
    assert plan(0.8, 0.004, 0.012, L, 48_000, 48_000) is not None


def test_vmap_batch_size_detection(monkeypatch):
    """The lowering switch must actually see through vmap: small batches
    take the barrel path, large ones the operand-batched gather."""
    rng = np.random.default_rng(5)
    T = 128 * 80
    rate, depth, base = 0.8, 0.004, 0.012
    L = modfx.max_delay_samples(base, depth)
    hist = np.zeros(L, np.float32)
    calls = []
    orig = modfx._barrel_taps
    monkeypatch.setattr(modfx, "_barrel_taps",
                        lambda *a, **k: calls.append(1) or orig(*a, **k))
    f = lambda x, h: modfx.modulated_delay(x, rate, depth, base, 0.5, h, 0)
    with precision.policy("fast"):
        xb = (rng.standard_normal((4, T)) * 0.5).astype(np.float32)
        jax.jit(jax.vmap(f))(xb, np.zeros((4, L), np.float32))
        assert calls, "B=4 under jit(vmap) must take the barrel path"
        calls.clear()
        xb = (rng.standard_normal((64, T)) * 0.1).astype(np.float32)
        jax.jit(jax.vmap(f))(xb, np.zeros((64, L), np.float32))
        assert not calls, "B=64 must take the operand-batched gather"


def test_barrel_gate_refuses_traced_params(monkeypatch):
    """A traced (modulated) rate must fall back to the gather path."""
    rng = np.random.default_rng(4)
    T = 128 * 80
    depth, base = 0.004, 0.012
    L = modfx.max_delay_samples(base, depth)
    x = (rng.standard_normal(T) * 0.5).astype(np.float32)
    hist = np.zeros(L, np.float32)
    seen = []
    orig = modfx._barrel_taps
    monkeypatch.setattr(modfx, "_barrel_taps",
                        lambda *a, **k: seen.append(1) or orig(*a, **k))
    with precision.policy("fast"):
        y, _, _ = jax.jit(lambda r: modfx.modulated_delay(
            x, r, depth, base, 0.5, hist, 0))(jnp.float32(0.8))
    assert not seen          # gather path taken
    assert np.isfinite(np.asarray(y)).all()


def test_barrel_nan_containment(monkeypatch):
    """A NaN input sample must poison exactly the same output set as the
    gather path — where-selects, not 0/1-mask multiplies (0.0 * NaN = NaN
    would smear it across every output sharing the window column)."""
    rng = np.random.default_rng(7)
    rate, depth, base, T = 0.8, 0.004, 0.012, 128 * 80
    L = modfx.max_delay_samples(base, depth)
    x = (rng.standard_normal(T) * 0.5).astype(np.float32)
    x[T // 2] = np.nan
    hist = (rng.standard_normal(L) * 0.3).astype(np.float32)
    with precision.policy("fast"):
        assert modfx._barrel_plan(rate, depth, base, L, T, 48_000)
        (y1, _, _), (y2, _, _) = _both_paths(
            x, rate, depth, base, 0.5, hist, 0, monkeypatch)
    n1 = np.isnan(np.asarray(y1))
    n2 = np.isnan(np.asarray(y2))
    np.testing.assert_array_equal(n1, n2)
    assert n1.sum() > 0           # the NaN does reach the output


def test_barrel_gate_counts_explicit_batch():
    """An un-vmapped [B, T] call is just as batched as a vmapped one: at
    B > 8 the operand-batched gather must win (the barrel frames would
    materialize B x 11 MB of HBM)."""
    rng = np.random.default_rng(8)
    B, T = 16, 128 * 80
    rate, depth, base = 0.8, 0.004, 0.012
    L = modfx.max_delay_samples(base, depth)
    x = (rng.standard_normal((B, T)) * 0.5).astype(np.float32)
    hist = (rng.standard_normal((B, L)) * 0.3).astype(np.float32)

    called = []
    orig = modfx._barrel_taps
    def spy(*a, **k):
        called.append(True)
        return orig(*a, **k)
    try:
        modfx._barrel_taps = spy
        with precision.policy("fast"):
            y, _, _ = modfx.modulated_delay(
                x, rate, depth, base, 0.5, hist, 0)
    finally:
        modfx._barrel_taps = orig
    assert not called, "explicit [B,T] batch must take the gather path"
    assert np.isfinite(np.asarray(y)).all()

    # and a small explicit batch still uses the barrel lowering
    called.clear()
    try:
        modfx._barrel_taps = spy
        with precision.policy("fast"):
            modfx.modulated_delay(x[:2], rate, depth, base, 0.5,
                                  hist[:2], 0)
    finally:
        modfx._barrel_taps = orig
    assert called, "B=2 explicit batch should keep the barrel path"
