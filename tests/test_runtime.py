"""Streaming session, checkpoint/resume, observability."""

import numpy as np
import pytest

import dsp_stuff_tpu as dst
from dsp_stuff_tpu.ids import IdSpace
from dsp_stuff_tpu.runtime.stream import StreamSession, make_ring
from dsp_stuff_tpu.runtime import checkpoint as ckpt
from dsp_stuff_tpu.utils import obs, precision

RNG = np.random.default_rng(0)


def _chain():
    g = dst.Graph(IdSpace())
    inp = g.add("input")
    lp = g.add("low_pass", ratio=0.8)
    rv = g.add("reverb", seconds=0.01, decay=0.6)
    out = g.add("output")
    g.chain(inp, lp, rv, out)
    return g, inp.id


def test_stream_matches_offline():
    """Block-by-block streaming must equal the one-shot offline render."""
    g, inp_id = _chain()
    T = 1024
    x = (RNG.standard_normal(T) * 0.3).astype(np.float32)
    offline, _, _ = dst.render(g, {str(inp_id): x})

    sess = StreamSession(g, block_size=128)
    blocks = [sess.process({str(inp_id): x[i:i + 128]})
              for i in range(0, T, 128)]
    streamed = np.concatenate([b[0] for b in blocks])
    np.testing.assert_allclose(streamed, offline[0], atol=1e-6)


def test_process_many_matches_process():
    """Pipelined multi-block dispatch must be block-exact vs process()."""
    g, inp_id = _chain()
    T = 128 * 12
    x = (np.random.default_rng(21).standard_normal(T) * 0.3
         ).astype(np.float32)

    s1 = StreamSession(g)
    want = np.concatenate([s1.process({str(inp_id): x[i:i + 128]})[0]
                           for i in range(0, T, 128)])
    s2 = StreamSession(g)
    got1 = s2.process_many({str(inp_id): x[:128 * 5]})       # k = 5
    got2 = s2.process_many({str(inp_id): x[128 * 5:]})       # k = 7
    got = np.concatenate([got1[0], got2[0]])
    np.testing.assert_array_equal(got, want)

    # state carried identically: one more single block agrees too
    nxt = (np.random.default_rng(22).standard_normal(128) * 0.3
           ).astype(np.float32)
    np.testing.assert_array_equal(
        s1.process({str(inp_id): nxt}), s2.process({str(inp_id): nxt}))

    with pytest.raises(ValueError, match="multiple"):
        s2.process_many({str(inp_id): x[:100]})


def test_process_many_generator_graph():
    """No-input graphs pipeline via n_blocks."""
    g = dst.Graph(IdSpace())
    sg = g.add("signal_gen", frequency=440.0, amplitude=0.8, mode="Sine")
    out = g.add("output")
    g.chain(sg, out)
    s1 = StreamSession(g)
    want = np.concatenate([s1.process()[0] for _ in range(6)])
    s2 = StreamSession(g)
    got = s2.process_many(n_blocks=6)[0]
    np.testing.assert_array_equal(got, want)


def test_stream_ring_pump():
    g, inp_id = _chain()
    sess = StreamSession(g, block_size=128)
    assert not sess.pump()                      # no input buffered yet
    x = (RNG.standard_normal(300) * 0.3).astype(np.float32)
    sess.feed(inp_id, x)                        # 300 samples = 2 full blocks
    assert sess.pump()
    assert sess.pump()
    assert not sess.pump()                      # only 44 left
    out_id = sess.cg.output_ids[0]
    got = sess.drain_output(out_id, 256)
    assert got.shape == (256,)
    # underrun zero-fills
    more = sess.drain_output(out_id, 100)
    assert np.all(more == 0.0)
    # resync drains rings but keeps DSP state
    sess.feed(inp_id, x)
    sess.resync()
    assert not sess.pump()


def test_stream_block_multiple_of_128():
    g, inp_id = _chain()
    with pytest.raises(ValueError):
        StreamSession(g, block_size=100)
    sess = StreamSession(g, block_size=256)
    x = (RNG.standard_normal(256) * 0.3).astype(np.float32)
    out = sess.process({str(inp_id): x})
    assert out.shape == (1, 256)


def test_checkpoint_resume(tmp_path):
    """Resume mid-render vs an uninterrupted render: bit-identical under
    the 'exact' policy (whose fences pin op order regardless of how the
    render is segmented); under 'parity' the segmentation changes XLA's
    fusion context and FMA-contraction choices, so the contract there is
    the parity budget, not bit equality (observed up to 1 ulp)."""
    g, inp_id = _chain()
    T = 1024
    x = (RNG.standard_normal(T) * 0.3).astype(np.float32)

    def run(policy):
        with precision.policy(policy):
            cg = dst.compile_graph(g)
            full, _, _ = cg.render({str(inp_id): x})
            half1, _, st = cg.render({str(inp_id): x[:512]})
            p = str(tmp_path / f"ck_{policy}.npz")
            ckpt.save_checkpoint(p, g, state=st, meta={"t": 512})
            g2, st2, params2, meta = ckpt.load_checkpoint(p)
            assert meta == {"t": 512}
            cg2 = dst.compile_graph(g2)
            half2, _, _ = cg2.render({str(cg2.input_ids[0]): x[512:]},
                                     state=st2)
        got = np.concatenate([np.asarray(half1)[0], np.asarray(half2)[0]])
        return got, np.asarray(full)[0]

    got, want = run("exact")
    np.testing.assert_array_equal(got, want)
    got, want = run("parity")
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_debug_render_reports_all_nodes():
    g, inp_id = _chain()
    x = (RNG.standard_normal(512) * 0.3).astype(np.float32)
    outs, report = obs.debug_render(g, {str(inp_id): x})
    cfgs = {r["cfg"] for r in report}
    assert {"input", "low_pass", "reverb"} <= cfgs
    assert all(r["nan"] == 0 for r in report)
    assert outs.shape == (1, 512)


def test_debug_render_flags_nan():
    g = dst.Graph(IdSpace())
    inp = g.add("input")
    dt = g.add("distort", mode="Fuzz", level=4.0)   # NaN on silent blocks
    out = g.add("output")
    g.chain(inp, dt, out)
    x = np.zeros(256, np.float32)
    outs, report = obs.debug_render(g, {str(inp.id): x})
    fuzz_recs = [r for r in report if r["cfg"] == "distort"]
    assert fuzz_recs and fuzz_recs[0]["nan"] > 0


def test_nan_guard():
    fn = obs.nan_guard(lambda x: x / 0.0, "div")
    with pytest.raises(FloatingPointError):
        fn(np.float32(1.0))


def test_make_ring_fallback_semantics():
    from dsp_stuff_tpu.runtime.stream import _PyRing
    for ring in (make_ring(64), _PyRing(64)):
        assert ring.write(np.arange(50, dtype=np.float32)) == 50
        assert ring.write(np.arange(50, dtype=np.float32)) == 14
        got = ring.read(100)
        assert got.size == 64
        ring.drain()
        assert ring.readable == 0


def _passthrough_session():
    """input -> output so the output ring carries the input verbatim
    (modulo the two fan-in 1/1.0001 scalings), making skip behavior easy
    to assert sample-by-sample."""
    g = dst.Graph(IdSpace())
    inp = g.add("input")
    out = g.add("output")
    g.chain(inp, out)
    return StreamSession(g, block_size=128), inp.id, None


def test_catchup_skips_backlog_after_resync():
    """devices.rs:459-483: with the counter armed and >= 2 blocks of
    backlog, the playback read drops the backlog and plays the newest
    block; the ring is fully drained afterwards."""
    sess, inp_id, _ = _passthrough_session()
    out_id = sess.cg.output_ids[0]
    x = np.arange(1, 128 * 4 + 1, dtype=np.float32)   # 4 distinguishable blocks
    sess.feed(inp_id, x)
    for _ in range(4):
        assert sess.pump()
    assert sess.out_rings[out_id].readable == 512
    sess.resync()                                      # counter := 5
    got = sess.drain_output(out_id, 128)
    # newest block = samples 385..512 (scaled by the output-port fan-in)
    want = (x[384:] / np.float32(1.0001)).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert sess.out_rings[out_id].readable == 0        # backlog dropped
    assert sess._catchup[out_id] == 4                  # decremented once


def test_catchup_counter_decrements_and_expires():
    """The counter saturating-decrements on every successful read; after 5
    reads without enough backlog it expires and later backlog is NOT
    skipped (devices.rs:410-418)."""
    sess, inp_id, _ = _passthrough_session()
    out_id = sess.cg.output_ids[0]
    sess.resync()
    assert sess._catchup[out_id] == 5
    # 5 reads with exactly one block buffered (no backlog): counter drains
    for i in range(5):
        sess.feed(inp_id, np.ones(128, np.float32))
        assert sess.pump()
        got = sess.drain_output(out_id, 128)
        assert got.size == 128 and got[0] != 0.0
        assert sess._catchup[out_id] == 4 - i
    # now build a big backlog: with the counter at 0 nothing is skipped
    sess.feed(inp_id, np.ones(512, np.float32))
    for _ in range(4):
        assert sess.pump()
    got = sess.drain_output(out_id, 128)
    assert sess.out_rings[out_id].readable == 384      # backlog kept
    # underrun reads never decrement the counter (fetch_update sits inside
    # the try_grant-success branch)
    sess.resync()
    before = sess._catchup[out_id]
    sess.out_rings[out_id].drain()
    silence = sess.drain_output(out_id, 128)
    assert np.all(silence == 0.0)
    assert sess._catchup[out_id] == before


def test_underrun_returns_silence_without_consuming():
    """try_grant(n) failing leaves the ring untouched: a partial buffer is
    NOT consumed, the callback emits a full block of zeros
    (devices.rs:436-440,495-499)."""
    sess, inp_id, _ = _passthrough_session()
    out_id = sess.cg.output_ids[0]
    sess.feed(inp_id, np.ones(128, np.float32))
    assert sess.pump()
    got = sess.drain_output(out_id, 256)               # only 128 buffered
    assert np.all(got == 0.0)
    assert sess.out_rings[out_id].readable == 128      # kept for next tick
    got = sess.drain_output(out_id, 128)
    assert got[0] != 0.0


def test_pyring_wraparound():
    """Array circular buffer: reads/writes crossing the wrap point."""
    from dsp_stuff_tpu.runtime.stream import _PyRing
    ring = _PyRing(8)
    assert ring.write(np.arange(6, dtype=np.float32)) == 6
    np.testing.assert_array_equal(ring.read(4), np.arange(4, dtype=np.float32))
    # head=4, size=2; write 5 -> wraps
    assert ring.write(np.arange(10, 15, dtype=np.float32)) == 5
    np.testing.assert_array_equal(
        ring.read(7), np.array([4, 5, 10, 11, 12, 13, 14], np.float32))
    assert ring.readable == 0


def test_compile_rejects_non_128_block():
    """Fuzz block-max and the signal_gen clock wrap are pinned to the
    reference's 128 frame, so compile_graph must reject block sizes that
    don't tile it (ADVICE r1)."""
    g, _ = _chain()
    with pytest.raises(ValueError, match="multiple of 128"):
        dst.compile_graph(g, block_size=100)


def test_mismatched_input_lengths_raise():
    """Two external inputs with different T must fail with a clear error
    naming the offender, not an opaque reshape inside the render."""
    g = dst.Graph(IdSpace())
    i1 = g.add("input")
    i2 = g.add("input")
    add = g.add("add")
    out = g.add("output")
    g.connect(i1, "out", add, "a")
    g.connect(i2, "out", add, "b")
    g.connect(add, "out", out, "in")
    cg = dst.compile_graph(g)
    with pytest.raises(ValueError, match="disagree on render length"):
        cg.fn(cg.init_state(), {str(i1.id): np.zeros(256, np.float32),
                                str(i2.id): np.zeros(512, np.float32)})


def test_batched_dict_input_without_batch_shape_raises():
    """Batched streams need batch_shape= (stateful nodes need vmapped
    state); a [B, T] dict value with batch_shape=() must fail up front
    with a pointer to batch_shape, not a broadcast error deep inside the
    cycle scan."""
    g, inp_id = _chain()
    x = np.zeros((4, 256), np.float32)
    cg = dst.compile_graph(g)
    with pytest.raises(ValueError, match="batch_shape"):
        cg.render({str(inp_id): x})
    # and the documented form works
    outs, _, _ = cg.render({str(inp_id): x}, batch_shape=(4,))
    assert np.asarray(outs).shape == (4, 1, 256)


def test_chorus_lfo_phase_bounded_for_long_streams():
    """The LFO phase is reduced mod 1 in f64 before the f32 sin, so a
    sample clock past 2^24 (where f32 quantizes) behaves exactly like the
    equivalent early-phase clock (ADVICE r1: long-session tap jitter)."""
    from dsp_stuff_tpu.ops.modfx import modulated_delay
    rng = np.random.default_rng(5)
    x = (rng.standard_normal(512) * 0.3).astype(np.float32)
    L = 200
    hist = (rng.standard_normal(L) * 0.1).astype(np.float32)
    # rate=1.5 Hz at 48 kHz -> period 32000 samples; t0 = 32000 * 2400
    # (= 76.8M >> 2^24) is an integer number of LFO cycles, i.e. the same
    # phase as t0 = 0
    kw = dict(rate_hz=np.float32(1.5), depth_s=np.float32(0.002),
              base_s=np.float32(0.003), mix=np.float32(0.6))
    y0, _, _ = modulated_delay(x, hist=hist, t0=np.int64(0), **kw)
    y1, _, _ = modulated_delay(x, hist=hist, t0=np.int64(32000 * 2400), **kw)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)


def test_stream_matches_offline_with_chorus():
    """Streaming chains the chorus sample clock (scalar lockstep state)
    identically to a one-shot render."""
    g = dst.Graph(IdSpace())
    inp = g.add("input")
    ch = g.add("chorus", rate=2.0, depth=0.002, base=0.006, mix=0.6)
    rv = g.add("reverb", seconds=0.005, decay=0.5)
    out = g.add("output")
    g.chain(inp, ch, rv, out)
    T = 1024
    x = (RNG.standard_normal(T) * 0.3).astype(np.float32)
    offline, _, _ = dst.render(g, {str(inp.id): x})
    sess = StreamSession(g, block_size=128)
    blocks = [sess.process({str(inp.id): x[i:i + 128]})
              for i in range(0, T, 128)]
    streamed = np.concatenate([b[0] for b in blocks])
    np.testing.assert_allclose(streamed, offline[0], atol=2e-6)


def test_stream_feedback_graph_matches_offline():
    """Block-by-block streaming of a FEEDBACK graph must equal the
    one-shot render: the cycle's back-edge previous-block context is DSP
    state and must ride the carried state across process() calls
    (regression: it was re-zeroed per render, glitching every block
    boundary by ~-25 dBFS; found by the random-graph segmentation fuzz)."""
    g = dst.Graph()
    inp = g.add("input")
    ad = g.add("add")
    rv = g.add("reverb", seconds=0.005, decay=0.5)
    gn = g.add("gain", level=0.4)
    out = g.add("output")
    g.connect(inp, "out", ad, "a")
    g.connect(ad, "out", rv, "in")
    g.connect(rv, "out", gn, "in")
    g.connect(gn, "out", ad, "b")          # back edge
    g.connect(rv, "out", out, "in")
    T = 1536
    x = (RNG.standard_normal(T) * 0.3).astype(np.float32)
    offline, _, _ = dst.render(g, {str(inp.id): x})
    sess = StreamSession(g, block_size=128)
    blocks = [sess.process({str(inp.id): x[i:i + 128]})
              for i in range(0, T, 128)]
    streamed = np.concatenate([b[0] for b in blocks])
    np.testing.assert_allclose(streamed, offline[0], rtol=0, atol=1e-6)


def test_process_many_honors_params_change():
    """A ``sess.params`` update must reach process_many() exactly like
    process(): params are baked at trace time (trace-time-constant rule),
    so the chunk fn re-traces when the snapshot changes."""
    g = dst.Graph(IdSpace())
    inp = g.add("input")
    gn = g.add("gain", level=1.0)
    out = g.add("output")
    g.chain(inp, gn, out)
    x = np.ones(128 * 2, np.float32) * 0.5

    s = StreamSession(g)
    base = s.process_many({str(inp.id): x})[0]
    s.params = {str(gn.id): {"level": 2.0}}
    via_many = s.process_many({str(inp.id): x})[0]
    s2 = StreamSession(g, params={str(gn.id): {"level": 2.0}})
    via_proc = np.concatenate(
        [s2.process({str(inp.id): x[i:i + 128]})[0] for i in (0, 128)])
    np.testing.assert_array_equal(via_many, via_proc)
    assert np.max(np.abs(via_many)) > 1.5 * np.max(np.abs(base))


def test_process_many_empty_dict():
    """process_many({}) must behave like process({}): zeros for every
    input — but needs n_blocks to know the length."""
    g, inp_id = _chain()
    s = StreamSession(g)
    with pytest.raises(ValueError, match="n_blocks"):
        s.process_many({})
    got = s.process_many({}, n_blocks=3)
    s2 = StreamSession(g)
    want = np.concatenate([s2.process({})[0] for _ in range(3)])
    np.testing.assert_array_equal(got[0], want)
