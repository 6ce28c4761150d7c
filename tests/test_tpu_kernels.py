"""REAL-Mosaic megakernel verification on the TPU chip (round-5 ask #1).

The chain megakernel (ops/pallas_chain.py) and the cycle megakernel
(ops/pallas_cycle.py) are default-on for fast-policy batches >= 64 on
TPU backends, but the regular suite exercises them only in interpret
mode on CPU (test_chain_segment.py / test_cycle_segment.py).  These
tests run ONLY under DST_TEST_TPU=1 on a real chip and pin the actual
Mosaic lowering — outputs AND handed-back states — against the same
graph's fallback/interpreter path on identical inputs, plus the engaged
fast path against the per-sample NumPy oracle of the reference
semantics (node.rs:135-146 process contract; the task loop both kernels
replace is runtime.rs:718-728).

Bounds: kernel vs fallback is cross-lowering noise of the same f32
math (bf16x3 manual splits vs XLA Precision.HIGH, FMA re-contraction)
— pinned at -80 dBFS relative.  Fast-vs-oracle is the documented fast
class (~-87/-88 dBFS, PARITY.md round-4 notes) — pinned at -84 dBFS.
"""

import functools

import numpy as np
import pytest

import dsp_stuff_tpu as dst
from dsp_stuff_tpu.compiler import compile as compile_mod
from dsp_stuff_tpu.ops import chain_segment as cs
from dsp_stuff_tpu.ops import cycle_segment as cyc
from dsp_stuff_tpu.utils import precision

from conftest import ON_TPU

pytestmark = pytest.mark.skipif(
    not ON_TPU, reason="real-Mosaic kernel verification needs the chip "
                       "(DST_TEST_TPU=1); CPU coverage is the interpret-"
                       "mode tests in test_chain_segment/test_cycle_segment")

SR = 48_000
B = 64          # smallest batch that engages the kernels (>= 64)


def _db(got, want):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    err = np.abs(got - want).max()
    den = max(float(np.abs(want).max()), 1e-9)
    return 20 * np.log10(max(err, 1e-30) / den)


def _assert_states_close(st_got, st_want, scale, db=-80.0):
    """State leaves hold downstream accumulations of the kernel-vs-
    fallback output noise, so the bound is relative to the larger of
    the leaf's own scale and the SIGNAL scale (the r3 lesson: an
    absolute/leaf-relative bound mis-scopes when a leaf is quieter than
    the signal whose error it inherits)."""
    import jax
    leaves_g = jax.tree.leaves(st_got)
    leaves_w = jax.tree.leaves(st_want)
    assert len(leaves_g) == len(leaves_w)
    for a, b in zip(leaves_g, leaves_w):
        a = np.asarray(a)
        b = np.asarray(b)
        if not np.issubdtype(a.dtype, np.floating):
            np.testing.assert_array_equal(a, b)
            continue
        err = np.abs(a.astype(np.float64) - b.astype(np.float64)).max()
        den = max(float(np.abs(b).max()), float(scale), 1e-3)
        assert err <= den * 10 ** (db / 20), (err, den)


def _bench_chain():
    from bench import build_chain
    return build_chain()


def test_chain_megakernel_on_chip_matches_fallback():
    """Full compiler path at B=64: the REAL Mosaic chain kernel vs the
    stage-composition fallback on the same inputs — outputs and every
    handed-back node state."""
    g, inp_id = _bench_chain()
    rng = np.random.default_rng(11)
    T = SR * 2
    x = (rng.standard_normal((B, 1, T)) * 0.25).astype(np.float32)
    cg = compile_mod.compile_graph(g)
    with precision.policy("fast"):
        y_k, _, st_k = cg.render(x, batch_shape=(B,))   # kernel engaged

    try:
        cs._use_kernel_orig = cs._use_kernel
        cs._use_kernel = lambda B, T, stages: False
        cs._segment_core.cache_clear()
        cs._segment_vjp.cache_clear()
        cg2 = compile_mod.compile_graph(g)
        with precision.policy("fast"):
            y_f, _, st_f = cg2.render(x, batch_shape=(B,))
    finally:
        cs._use_kernel = cs._use_kernel_orig
        cs._segment_core.cache_clear()
        cs._segment_vjp.cache_clear()

    assert _db(y_k, y_f) <= -80.0
    _assert_states_close(st_k, st_f, np.abs(np.asarray(y_f)).max())


def test_cycle_megakernel_on_chip_matches_interpreter():
    """config5's feedback SCC at B=64: the REAL Mosaic cycle kernel vs
    the lax.scan program interpreter on the same inputs — outputs and
    states (registers, cascade carries, comb ring)."""
    from dsp_stuff_tpu.models import config5_feedback_16node
    g, meta = config5_feedback_16node()
    rng = np.random.default_rng(12)
    T = SR * 1
    x = (rng.standard_normal((B, 1, T)) * 0.2).astype(np.float32)
    ext = np.asarray(x)
    cg = compile_mod.compile_graph(g)
    with precision.policy("fast"):
        y_k, _, st_k = cg.render(ext, batch_shape=(B,))   # kernel engaged

    try:
        cyc._use_kernel_orig = cyc._use_kernel
        cyc._use_kernel = lambda B, T, program: False
        cyc._cycle_core.cache_clear()
        cyc._cycle_vjp.cache_clear()
        cg2 = compile_mod.compile_graph(g)
        with precision.policy("fast"):
            y_i, _, st_i = cg2.render(ext, batch_shape=(B,))
    finally:
        cyc._use_kernel = cyc._use_kernel_orig
        cyc._cycle_core.cache_clear()
        cyc._cycle_vjp.cache_clear()

    assert _db(y_k, y_i) <= -80.0
    _assert_states_close(st_k, st_i, np.abs(np.asarray(y_i)).max())


def test_chorus_mtap_megakernel_on_chip_matches_fallback():
    """config2 (reverb -> chorus -> gain) at B=64: the REAL Mosaic
    chain kernel with an mtap stage — VMEM input ring, SMEM window
    starts, pltpu.roll + one-hot residual selects — vs the gather
    fallback on the same inputs, outputs and states (chorus hist + t0,
    comb ring)."""
    from dsp_stuff_tpu.models import config2_delay_chorus
    g, meta = config2_delay_chorus()
    rng = np.random.default_rng(15)
    T = SR * 2
    x = (rng.standard_normal((B, 1, T)) * 0.25).astype(np.float32)

    # FORCE the kernel (don't trust the gate — an over-budget ring
    # would silently run the fallback and make this test vacuous; the
    # gate itself is pinned by test_use_kernel_engages_config_shapes)
    try:
        cs._use_kernel_orig2 = cs._use_kernel
        cs._use_kernel = lambda B, T, stages: True
        cs._segment_core.cache_clear()
        cs._segment_vjp.cache_clear()
        cg = compile_mod.compile_graph(g)
        with precision.policy("fast"):
            y_k, _, st_k = cg.render(x, batch_shape=(B,))
    finally:
        cs._use_kernel = cs._use_kernel_orig2
        cs._segment_core.cache_clear()
        cs._segment_vjp.cache_clear()

    try:
        cs._use_kernel_orig = cs._use_kernel
        cs._use_kernel = lambda B, T, stages: False
        cs._segment_core.cache_clear()
        cs._segment_vjp.cache_clear()
        cg2 = compile_mod.compile_graph(g)
        with precision.policy("fast"):
            y_f, _, st_f = cg2.render(x, batch_shape=(B,))
    finally:
        cs._use_kernel = cs._use_kernel_orig
        cs._segment_core.cache_clear()
        cs._segment_vjp.cache_clear()

    assert _db(y_k, y_f) <= -80.0
    _assert_states_close(st_k, st_f, np.abs(np.asarray(y_f)).max())


def test_chain_megakernel_bt256_on_chip_matches_fallback():
    """The r5 PROMOTED geometry — batch a 256-multiple picks BT=256 /
    TB=8 with a computed scoped-VMEM limit (pallas_chain.pick_bt;
    measured 492,388 -> 520,423 audio-s/s at the bench chain) — vs the
    fallback composition at B=256.  B=64 above never promotes, so this
    is the only on-chip correctness pin for the geometry the bench
    numbers run at."""
    from dsp_stuff_tpu.ops import pallas_chain as pc
    g, inp_id = _bench_chain()
    rng = np.random.default_rng(16)
    T = SR * 1
    x = (rng.standard_normal((256, 1, T)) * 0.25).astype(np.float32)
    cg = compile_mod.compile_graph(g)
    with precision.policy("fast"):
        y_k, _, st_k = cg.render(x, batch_shape=(256,))   # BT=256 engaged

    try:
        cs._use_kernel_orig = cs._use_kernel
        cs._use_kernel = lambda B, T, stages: False
        cs._segment_core.cache_clear()
        cs._segment_vjp.cache_clear()
        cg2 = compile_mod.compile_graph(g)
        with precision.policy("fast"):
            y_f, _, st_f = cg2.render(x, batch_shape=(256,))
    finally:
        cs._use_kernel = cs._use_kernel_orig
        cs._segment_core.cache_clear()
        cs._segment_vjp.cache_clear()

    assert _db(y_k, y_f) <= -80.0
    _assert_states_close(st_k, st_f, np.abs(np.asarray(y_f)).max())


def test_chain_megakernel_big_ring_full_tile_on_chip():
    """A 1 s comb (375 ring blocks, ~49 MiB of ring scratch at bt=128)
    now keeps the FULL batch tile under a computed scoped-VMEM limit
    instead of halving to bt=32 (the pre-r5 flat 6 MiB budget) — pin
    that the remote Mosaic compiler accepts the raised limit and the
    lowering is correct vs the fallback."""
    import dsp_stuff_tpu as dst
    from dsp_stuff_tpu.ops import pallas_chain as pc
    g = dst.Graph()
    inp = g.add("input")
    gn = g.add("gain", level=0.9)
    rv = g.add("reverb", seconds=1.0, decay=0.35)
    out = g.add("output")
    g.chain(inp, gn, rv, out)
    stages = (("comb", 0.35, SR),)
    assert pc.pick_bt(stages) == 128            # full tile
    assert pc.vmem_limit_for(stages, 128, 2) is not None

    rng = np.random.default_rng(17)
    T = SR * 1
    x = (rng.standard_normal((B, 1, T)) * 0.25).astype(np.float32)
    cg = compile_mod.compile_graph(g)
    with precision.policy("fast"):
        y_k, _, st_k = cg.render(x, batch_shape=(B,))

    try:
        cs._use_kernel_orig = cs._use_kernel
        cs._use_kernel = lambda B, T, stages: False
        cs._segment_core.cache_clear()
        cs._segment_vjp.cache_clear()
        cg2 = compile_mod.compile_graph(g)
        with precision.policy("fast"):
            y_f, _, st_f = cg2.render(x, batch_shape=(B,))
    finally:
        cs._use_kernel = cs._use_kernel_orig
        cs._segment_core.cache_clear()
        cs._segment_vjp.cache_clear()

    assert _db(y_k, y_f) <= -80.0
    _assert_states_close(st_k, st_f, np.abs(np.asarray(y_f)).max())


def test_fast_batched_chain_vs_oracle_on_chip():
    """The ENGAGED fast path (chain megakernel at batch) against the
    per-sample NumPy oracle on stream 0: the documented fast class
    (~-87/-88 dBFS, PARITY.md) — the regression pin for the path that
    produces the batch-512 aggregate bench numbers."""
    from bench import oracle_chain
    g, inp_id = _bench_chain()
    rng = np.random.default_rng(13)
    T = SR * 2
    x = (rng.standard_normal((B, 1, T)) * 0.25).astype(np.float32)
    cg = compile_mod.compile_graph(g)
    with precision.policy("fast"):
        y, _, _ = cg.render(x, batch_shape=(B,))
    got = np.asarray(y)[0, 0]
    want = oracle_chain(x[0, 0])
    assert _db(got, want) <= -84.0


def test_fast_batched_config5_vs_graph_oracle_on_chip():
    """The ENGAGED cycle-kernel path against the block-wise graph
    oracle on stream 0 (fast-class bound)."""
    from oracle.graph import evaluate
    from dsp_stuff_tpu.models import config5_feedback_16node
    g, meta = config5_feedback_16node()
    rng = np.random.default_rng(14)
    T = SR * 1
    x = (rng.standard_normal((B, 1, T)) * 0.2).astype(np.float32)
    cg = compile_mod.compile_graph(g)
    with precision.policy("fast"):
        y, _, _ = cg.render(np.asarray(x), batch_shape=(B,))
    got = np.asarray(y)[0, 0]
    want = evaluate(g, {int(meta["input"]): x[0, 0]}, T)
    want = want[cg.output_ids[0]]
    assert _db(got, want) <= -80.0
