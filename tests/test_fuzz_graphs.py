"""Randomized graph-level parity fuzz: arbitrary topologies (fan-in,
fan-out, feedback cycles, modulation wiring) rendered under the parity
policy must match the independent block-wise NumPy oracle interpreter
(tests/oracle/graph.py) to <= -90 dBFS.

This is the compiler-semantics safety net the per-node and per-config
tests can't give: it exercises SCC ordering, cycle block latency, fan-in
averaging order, modulation mapping and state chaining on topologies
nobody hand-wrote."""

import numpy as np
import pytest

from conftest import bitwise_cpu_only

import dsp_stuff_tpu as dst
from dsp_stuff_tpu.ids import IdSpace
from dsp_stuff_tpu.utils import precision

import oracle
from oracle import graph as oracle_graph

T = 1536


# reassociation-free, transcendental-free types: the exact policy's
# BITWISE claim holds for these (PARITY.md scope)
def _exact_pool(rng):
    return [
        ("gain", {"level": float(rng.uniform(0.3, 1.8))}),
        ("add", {}),
        ("mix", {"ratio": float(rng.uniform(0.1, 0.9))}),
        ("distort", {"mode": str(rng.choice(
            ["HardClip", "SoftClip", "Square", "Chebyshev4",
             "RecipSoftClip"])),
            "level": float(rng.uniform(0.5, 6.0))}),
        ("biquad", {"a0": 1.0, "a1": float(rng.uniform(-0.6, 0.0)),
                    "a2": float(rng.uniform(0.0, 0.2)),
                    "b0": float(rng.uniform(0.4, 1.0)),
                    "b1": float(rng.uniform(-0.2, 0.2)), "b2": 0.0}),
        ("low_pass", {"ratio": float(rng.uniform(0.1, 0.9))}),
        ("high_pass", {"ratio": float(rng.uniform(0.05, 0.6))}),
        ("reverb", {"seconds": float(rng.uniform(0.003, 0.012)),
                    "decay": float(rng.uniform(0.2, 0.6))}),
        ("fir", {"mode": "Balanced",
                 "taps": [float(v) for v in
                          rng.standard_normal(int(rng.integers(2, 24)))
                          * 0.3]}),
        ("mux", {"in_port": str(rng.choice(["A", "B"]))}),
        ("demux", {"out_port": str(rng.choice(["A", "B"]))}),
    ]


# (type, params) factories with stable, non-degenerate settings
def _mid_pool(rng):
    return [
        ("gain", {"level": float(rng.uniform(0.3, 1.8))}),
        ("add", {}),
        ("mix", {"ratio": float(rng.uniform(0.1, 0.9))}),
        ("distort", {"mode": str(rng.choice(
            ["HardClip", "SoftClip", "Tanh", "RecipSoftClip", "Sin",
             "Atan", "Square", "Chebyshev4"])),
            "level": float(rng.uniform(0.5, 6.0))}),
        ("overdrive", {"boost": float(rng.uniform(1.0, 8.0)),
                       "drive": float(rng.uniform(0.2, 0.9)),
                       "level": float(rng.uniform(0.3, 1.0))}),
        ("chebyshev", {"level_pos": float(rng.uniform(0.5, 5.0)),
                       "level_neg": float(rng.uniform(0.5, 5.0))}),
        ("biquad", {"a0": 1.0, "a1": float(rng.uniform(-0.6, 0.0)),
                    "a2": float(rng.uniform(0.0, 0.2)),
                    "b0": float(rng.uniform(0.4, 1.0)),
                    "b1": float(rng.uniform(-0.2, 0.2)), "b2": 0.0}),
        ("low_pass", {"ratio": float(rng.uniform(0.1, 0.9))}),
        ("high_pass", {"ratio": float(rng.uniform(0.05, 0.6))}),
        ("envelope", {"attack": float(rng.uniform(1.0, 200.0)),
                      "release": float(rng.uniform(5.0, 400.0))}),
        ("reverb", {"seconds": float(rng.uniform(0.003, 0.012)),
                    "decay": float(rng.uniform(0.2, 0.6))}),
        ("fir", {"mode": "Balanced",
                 "taps": [float(v) for v in
                          rng.standard_normal(int(rng.integers(2, 24)))
                          * 0.3]}),
        ("chorus", {"rate": float(rng.uniform(0.3, 4.0)),
                    "depth": float(rng.uniform(0.001, 0.004)),
                    "base": float(rng.uniform(0.004, 0.012)),
                    "mix": float(rng.uniform(0.2, 0.8))}),
        ("mux", {"in_port": str(rng.choice(["A", "B"]))}),
        ("demux", {"out_port": str(rng.choice(["A", "B"]))}),
    ]


def _random_graph(seed, exact=False):
    rng = np.random.default_rng(seed)
    g = dst.Graph(IdSpace())
    inp = g.add("input")
    nodes = [inp]
    n_mid = int(rng.integers(3, 8))
    pool = _exact_pool(rng) if exact else _mid_pool(rng)
    for _ in range(n_mid):
        t, params = pool[int(rng.integers(0, len(pool)))]
        nodes.append(g.add(t, **params))
    out = g.add("output")

    # wire every middle node's audio inputs from random earlier outputs
    for i, node in enumerate(nodes[1:], start=1):
        for port in node.spec.inputs:
            src = nodes[int(rng.integers(0, i))]
            src_port = str(rng.choice(list(src.spec.outputs)))
            g.connect(src, src_port, node, port)
    last = nodes[-1]
    g.connect(last, str(rng.choice(list(last.spec.outputs))), out, "in")

    # occasional extra fan-in / fan-out
    for _ in range(int(rng.integers(0, 3))):
        a = nodes[int(rng.integers(1, len(nodes)))]
        b = nodes[int(rng.integers(1, len(nodes)))]
        if a is b or not a.spec.outputs or not b.spec.inputs:
            continue
        g.connect(a, str(rng.choice(list(a.spec.outputs))),
                  b, str(rng.choice(list(b.spec.inputs))))

    # occasionally close feedback edges (later -> earlier); always legal —
    # the compiler defines one-block latency for any back edge.  A second
    # edge can create nested or multiple independent SCCs.
    n_back = int(rng.random() < 0.6) + int(rng.random() < 0.25)
    for _ in range(n_back):
        if len(nodes) < 3:
            break
        si = int(rng.integers(2, len(nodes)))
        src = nodes[si]
        dst_n = nodes[int(rng.integers(1, si))]
        if src.spec.outputs and dst_n.spec.inputs:
            g.connect(src, str(rng.choice(list(src.spec.outputs))),
                      dst_n, str(rng.choice(list(dst_n.spec.inputs))))

    # occasionally modulate an as_input port from a slow sine (the sine
    # LFO is transcendental -> skipped in exact-pool graphs)
    mod_targets = [] if exact else [
        (n, ps.name) for n in nodes[1:]
        for ps in n.spec.params if getattr(ps, "as_input", False)]
    if mod_targets and rng.random() < 0.5:
        lfo = g.add("signal_gen", mode="Sine",
                    frequency=float(rng.uniform(0.3, 5.0)),
                    amplitude=float(rng.uniform(0.2, 0.8)))
        n, pname = mod_targets[int(rng.integers(0, len(mod_targets)))]
        g.connect(lfo, "out", n, pname)
    return g, inp.id, out.id


@pytest.mark.parametrize("seed", [1, 2, 3, 5, 8, 13, 21, 34, 55, 89,
                                  144, 233, 377, 610, 987, 1597])
def test_random_graph_parity_vs_oracle(seed):
    # -84, not -90: the BASELINE -90 dBFS contract is for the benchmark
    # configs (which hold with >30 dB margin, test_presets.py).  Fuzzed
    # topologies can stack a 1-ulp-class op (chorus tap interpolation,
    # transcendental shapers) into a downstream high-gain shaper whose
    # slope (chebyshev level up to 5 here) legitimately amplifies the ulp
    # past -90 -- e.g. one f32 phase-bit flip moves a chorus tap ~6e-5
    # samples -> ~-96 dBFS wet, x3.8 slope -> -84.6 (seed 3).  The strict
    # guarantee lives in the BITWISE fuzz below on the
    # reassociation-free pool.
    g, inp_id, out_id = _random_graph(seed)
    rng = np.random.default_rng(1000 + seed)
    x = (rng.standard_normal(T) * 0.25).astype(np.float32)
    with precision.policy("parity"):
        outs, _, _ = dst.render(g, {str(inp_id): x})
    want = oracle_graph.evaluate(g, {inp_id: x}, T)[out_id]
    got = np.asarray(outs)[0]
    assert np.isfinite(want).all(), "oracle blew up — bad generator params"
    db = oracle.max_err_dbfs(got, want)
    assert db <= -84.0, f"seed {seed}: {db:.1f} dBFS"


@pytest.mark.parametrize("seed", [2, 8, 21])
def test_random_graph_batch_invariance(seed):
    """Stream independence on arbitrary topologies: stream 0 of a batched
    render equals the solo render (vmap invariance + lockstep shared
    state), fast policy."""
    g, inp_id, out_id = _random_graph(seed)
    rng = np.random.default_rng(2000 + seed)
    x = (rng.standard_normal((4, T)) * 0.25).astype(np.float32)
    with precision.policy("fast"):
        outs, _, _ = dst.render(g, {str(inp_id): x}, batch_shape=(4,))
        solo, _, _ = dst.render(g, {str(inp_id): x[0]})
    # batched-vs-solo lowerings differ on chip (vmapped GEMM tiling,
    # megakernels at batch): bf16-pass class, measured 2.6e-6 abs
    from conftest import ON_TPU
    np.testing.assert_allclose(np.asarray(outs)[0], np.asarray(solo),
                               rtol=0, atol=4e-5 if ON_TPU else 2e-6)


@pytest.mark.parametrize("seed", [1, 5, 13])
def test_random_graph_segmented_state_chaining(seed):
    """Two chained half-renders must match the one-shot render on random
    topologies — every node type's state carry at once (filters, rings,
    FIR warm-up, oscillator clocks, chorus history, envelope carry).
    Blocked lowerings legitimately reassociate differently when T
    changes, so the bound is loose-ish but far below audibility."""
    g, inp_id, out_id = _random_graph(seed)
    rng = np.random.default_rng(3000 + seed)
    x = (rng.standard_normal(T) * 0.25).astype(np.float32)
    half = T // 2
    with precision.policy("fast"):
        cg = dst.compile_graph(g)
        full, _, _ = cg.render({str(inp_id): x})
        a, _, st = cg.render({str(inp_id): x[:half]})
        b, _, _ = cg.render({str(inp_id): x[half:]}, state=st)
    got = np.concatenate([np.asarray(a)[0], np.asarray(b)[0]])
    db = oracle.max_err_dbfs(got, np.asarray(full)[0])
    assert db <= -100.0, f"seed {seed}: {db:.1f} dBFS"


@pytest.mark.parametrize("seed", [4, 9, 16, 25, 36, 49, 64, 81, 100, 121, 169, 196])
@bitwise_cpu_only
def test_random_graph_exact_bitwise(seed):
    """The exact policy's BITWISE claim, fuzzed: random topologies over
    the reassociation-free node pool (PARITY.md scope) must reproduce the
    oracle interpreter bit for bit -- fan-in order, producer FMA fences,
    IEEE divides, sequential recurrences, cycle latency, all at once."""
    g, inp_id, out_id = _random_graph(seed, exact=True)
    rng = np.random.default_rng(4000 + seed)
    x = (rng.standard_normal(T) * 0.25).astype(np.float32)
    with precision.policy("exact"):
        outs, _, _ = dst.render(g, {str(inp_id): x})
    want = oracle_graph.evaluate(g, {inp_id: x}, T)[out_id]
    np.testing.assert_array_equal(np.asarray(outs)[0], want,
                                  err_msg=f"seed {seed}")


@pytest.mark.parametrize("seed", [9, 25, 49])
@bitwise_cpu_only
def test_random_graph_exact_segmented_bitwise(seed):
    """Under the exact policy, state chaining is BITWISE: two half-renders
    must equal the one-shot render bit for bit (sequential recurrences +
    f64 FIR accumulate + ring/cycle context carry exactly)."""
    g, inp_id, out_id = _random_graph(seed, exact=True)
    rng = np.random.default_rng(5000 + seed)
    x = (rng.standard_normal(T) * 0.25).astype(np.float32)
    half = T // 2
    with precision.policy("exact"):
        cg = dst.compile_graph(g)
        full, _, _ = cg.render({str(inp_id): x})
        a, _, st = cg.render({str(inp_id): x[:half]})
        b, _, _ = cg.render({str(inp_id): x[half:]}, state=st)
    got = np.concatenate([np.asarray(a)[0], np.asarray(b)[0]])
    np.testing.assert_array_equal(got, np.asarray(full)[0],
                                  err_msg=f"seed {seed}")


@pytest.mark.parametrize("seed", [2, 7, 21])
def test_random_graph_streaming_matches_offline(seed):
    """The StreamSession surface fuzzed against the offline render on
    random topologies: 128-sample process() blocks and mixed-k
    process_many() chunks must carry every node type's state (cycle
    context, chorus history, FIR warm-up, oscillator clocks) across the
    API exactly like one offline render.  Blocked lowerings legitimately
    reassociate differently at different T, so the bound is the parity
    budget, not bitwise."""
    from dsp_stuff_tpu.runtime.stream import StreamSession
    g, inp_id, out_id = _random_graph(seed)
    rng = np.random.default_rng(6000 + seed)
    x = (rng.standard_normal(T) * 0.25).astype(np.float32)
    with precision.policy("fast"):
        offline, _, _ = dst.render(g, {str(inp_id): x})

        sess = StreamSession(g)
        blocks = [sess.process({str(inp_id): x[i:i + 128]})[0]
                  for i in range(0, T, 128)]
        streamed = np.concatenate(blocks)

        sess2 = StreamSession(g)
        k1 = 5 * 128
        got1 = sess2.process_many({str(inp_id): x[:k1]})[0]
        got2 = sess2.process_many({str(inp_id): x[k1:]})[0]
        pipelined = np.concatenate([got1, got2])

    ref = np.asarray(offline)[0]
    db_s = oracle.max_err_dbfs(streamed, ref)
    db_p = oracle.max_err_dbfs(pipelined, ref)
    assert db_s <= -90.0, f"seed {seed}: streaming {db_s:.1f} dBFS"
    assert db_p <= -90.0, f"seed {seed}: pipelined {db_p:.1f} dBFS"
    # the two streaming forms share block boundaries and state carry;
    # under the fast policy XLA may contract a*y+b differently inside
    # the scan body than in the straight-line block fn (fusion-context
    # FMA), so the residual is the 1-ulp class, not zero
    db_x = oracle.max_err_dbfs(pipelined, streamed)
    assert db_x <= -120.0, f"seed {seed}: forms differ {db_x:.1f} dBFS"


@pytest.mark.parametrize("seed", [3, 11, 42, 77, 123])
def test_random_graph_fast_policy_vs_oracle(seed):
    """FAST-policy renders vs the oracle interpreter on random topologies.

    The parity fuzz above runs with linear-run fusion OFF (fusion is
    fast-policy only), so this is the safety net for the fusion planner
    (compiler _plan_linear_fusion): random gain/filter/biquad
    adjacencies, fan-in/fan-out edge cases, and cycle exclusions all
    render through whatever runs the planner finds.  Bound: the fast
    blocked lowerings hold ~-84 dBFS worst-case on resonant draws (see
    test_biquad_blocked_fast_policy); the generator's pole range is
    benign, but transcendental stacking matches the parity fuzz note, so
    -80 dBFS."""
    g, inp_id, out_id = _random_graph(seed)
    rng = np.random.default_rng(7000 + seed)
    x = (rng.standard_normal(T) * 0.25).astype(np.float32)
    with precision.policy("fast"):
        outs, _, _ = dst.render(g, {str(inp_id): x})
    want = oracle_graph.evaluate(g, {inp_id: x}, T)[out_id]
    got = np.asarray(outs)[0]
    assert np.isfinite(want).all(), "oracle blew up — bad generator params"
    db = oracle.max_err_dbfs(got, want)
    assert db <= -80.0, f"seed {seed}: {db:.1f} dBFS"


def _random_linear_chain_graph(seed):
    """Chain-shaped generator that actually exercises the linear-run
    fusion planner: a straight chain of linear nodes (gain / low_pass /
    high_pass / biquad with stable random poles) with occasional
    nonlinear separators (run boundaries) and occasional analysis taps
    (extra-consumer exclusions)."""
    rng = np.random.default_rng(seed)
    g = dst.Graph(IdSpace())
    prev = g.add("input")
    inp_id = prev.id
    for _ in range(int(rng.integers(4, 10))):
        r = rng.random()
        if r < 0.22:
            n = g.add("gain", level=float(rng.uniform(0.2, 1.8)))
        elif r < 0.44:
            n = g.add("low_pass", ratio=float(rng.uniform(0.05, 0.95)))
        elif r < 0.62:
            n = g.add("high_pass", ratio=float(rng.uniform(0.05, 0.95)))
        elif r < 0.84:
            p1, p2 = rng.uniform(-0.9, 0.9, 2)        # stable real poles
            n = g.add("biquad", a0=1.0, a1=float(-(p1 + p2)),
                      a2=float(p1 * p2),
                      b0=float(rng.uniform(0.2, 1.0)),
                      b1=float(rng.uniform(-0.5, 0.5)),
                      b2=float(rng.uniform(-0.5, 0.5)))
        else:
            n = g.add("distort", mode="SoftClip",
                      level=float(rng.uniform(0.5, 4.0)))
        g.connect(prev, "out", n, "in")
        if rng.random() < 0.15:                        # tap blocks a run
            wv = g.add("wave_view")
            g.connect(n, "out", wv, "in")
        prev = n
    out = g.add("output")
    g.connect(prev, "out", out, "in")
    return g, inp_id, out.id


@pytest.mark.parametrize("seed", list(range(20)))
def test_random_linear_chain_fast_vs_oracle(seed):
    """Fast-policy chain fuzz over the fusion planner's whole surface:
    random run shapes (gain folds, one-pole pairs, biquads with stable
    random poles), dim-cap splits, and tap/nonlinearity boundaries must
    match the per-node oracle interpreter.  The l1-gated GEMM precision
    (utils.precision.gemm_precision) keeps resonant draws at HIGHEST,
    so the fast blocked bound applies throughout."""
    g, inp_id, out_id = _random_linear_chain_graph(seed)
    rng = np.random.default_rng(8000 + seed)
    x = (rng.standard_normal(T) * 0.25).astype(np.float32)
    with precision.policy("fast"):
        outs, _, _ = dst.render(g, {str(inp_id): x})
    want = oracle_graph.evaluate(g, {inp_id: x}, T)[out_id]
    got = np.asarray(outs)[0]
    assert np.isfinite(want).all(), "oracle blew up — bad generator params"
    db = oracle.max_err_dbfs(got, want)
    assert db <= -80.0, f"seed {seed}: {db:.1f} dBFS"


@pytest.mark.parametrize("seed", [0, 3, 5, 9, 14])
def test_random_linear_chain_segmented_state_carry(seed):
    """Two chained half-renders through fused runs equal the one-shot
    render: every run shape's composite-state handoff (one-pole
    components, the biquad DirectForm1 rebuild from run histories) at
    once.  CPU bound -100 dBFS (blocked lowerings reassociate when T
    changes); on TPU the bf16x3 GEMMs add block-alignment re-rounding
    (-10x class), same note as test_biquad_blocked_state_carry_fast."""
    from conftest import ON_TPU
    g, inp_id, out_id = _random_linear_chain_graph(seed)
    rng = np.random.default_rng(9000 + seed)
    x = (rng.standard_normal(T) * 0.25).astype(np.float32)
    half = T // 2
    with precision.policy("fast"):
        cg = dst.compile_graph(g)
        full, _, _ = cg.render({str(inp_id): x})
        a, _, st = cg.render({str(inp_id): x[:half]})
        b, _, _ = cg.render({str(inp_id): x[half:]}, state=st)
    got = np.concatenate([np.asarray(a)[0], np.asarray(b)[0]])
    db = oracle.max_err_dbfs(got, np.asarray(full)[0])
    bound = -90.0 if ON_TPU else -100.0
    assert db <= bound, f"seed {seed}: {db:.1f} dBFS"


def _plan_for(g):
    """The compiler's fusion plan for a graph (active nodes + SCCs
    computed exactly as compile_graph does)."""
    from dsp_stuff_tpu.compiler.compile import (_plan_linear_fusion,
                                                _active_nodes)
    from dsp_stuff_tpu.compiler.scc import condensation_topo_order
    active = _active_nodes(g)
    nodes = {nid: n for nid, n in g.nodes.items() if nid in active}
    edges = {nid: set() for nid in nodes}
    for l in g.links:
        if l.src in nodes and l.dst in nodes:
            edges[l.src].add(l.dst)
    sccs = condensation_topo_order(sorted(nodes), edges)
    return _plan_linear_fusion(g, nodes, sccs), sccs


def _random_feedback_linear_graph(seed, exact=False):
    """Feedback graphs whose cycle bodies contain fusable linear runs —
    the config5 shape, randomized: input -> add -> [linear run] -> ...
    with a gain-scaled back edge re-entering the add.  Sometimes the
    back edge taps a run INTERIOR instead of the tail (the planner must
    split the run there), and sometimes a nonlinear node sits inside
    the loop (a run boundary)."""
    rng = np.random.default_rng(seed)
    g = dst.Graph(IdSpace())
    inp = g.add("input")
    mixa = g.add("add")
    g.connect(inp, "out", mixa, "a")
    prev = mixa
    chain = []
    for _ in range(int(rng.integers(2, 5))):
        r = rng.random()
        if r < 0.3:
            n = g.add("gain", level=float(rng.uniform(0.2, 0.9)))
        elif r < 0.6:
            n = g.add("low_pass", ratio=float(rng.uniform(0.1, 0.9)))
        elif r < 0.8:
            n = g.add("high_pass", ratio=float(rng.uniform(0.05, 0.6)))
        else:
            p1, p2 = rng.uniform(-0.5, 0.5, 2)          # stable real poles
            n = g.add("biquad", a0=1.0, a1=float(-(p1 + p2)),
                      a2=float(p1 * p2),
                      b0=float(rng.uniform(0.3, 0.9)),
                      b1=float(rng.uniform(-0.3, 0.3)), b2=0.0)
        g.connect(prev, "out", n, "in")
        chain.append(n)
        prev = n
    if not exact and rng.random() < 0.4:        # nonlinear loop member
        n = g.add("distort", mode="SoftClip",
                  level=float(rng.uniform(0.5, 2.0)))
        g.connect(prev, "out", n, "in")
        prev = n
    fb = g.add("gain", level=float(rng.uniform(0.2, 0.5)))
    # back edge source: tail usually, an interior sometimes (splits runs)
    src = prev if rng.random() < 0.7 else \
        chain[int(rng.integers(0, len(chain)))]
    g.connect(src, "out", fb, "in")
    g.connect(fb, "out", mixa, "b")              # closes the SCC
    out = g.add("output")
    g.connect(prev, "out", out, "in")
    return g, inp.id, out.id


@pytest.mark.parametrize("seed", list(range(12)))
def test_random_feedback_linear_fast_vs_oracle(seed):
    """Fast-policy fuzz over IN-CYCLE linear-run fusion: cycle bodies
    with fusable runs (config5's shape randomized) must match the
    per-node oracle interpreter — run head fan-in inside the loop,
    interior-tap splits, tail back-edges, per-block composite state
    rebuild, all at once.  Non-vacuity: at least one seed's plan must
    contain an in-cycle run (asserted per-seed where the generator
    guarantees it)."""
    g, inp_id, out_id = _random_feedback_linear_graph(seed)
    plan, sccs = _plan_for(g)
    cyc = set()
    for comp in sccs:
        if len(comp) > 1:
            cyc.update(comp)
    in_cycle_runs = [r for r in plan if r[0] in cyc]
    rng = np.random.default_rng(11_000 + seed)
    x = (rng.standard_normal(T) * 0.25).astype(np.float32)
    with precision.policy("fast"):
        outs, _, _ = dst.render(g, {str(inp_id): x})
    want = oracle_graph.evaluate(g, {inp_id: x}, T)[out_id]
    got = np.asarray(outs)[0]
    assert np.isfinite(want).all(), "oracle blew up — bad generator params"
    db = oracle.max_err_dbfs(got, want)
    assert db <= -80.0, f"seed {seed}: {db:.1f} dBFS ({in_cycle_runs=})"


def test_feedback_linear_fusion_fuzz_not_vacuous():
    """The generator must actually produce in-cycle runs for the fuzz
    above to exercise (a planner regression that silently stops fusing
    cycles would otherwise pass every seed)."""
    hits = 0
    for seed in range(12):
        g, _, _ = _random_feedback_linear_graph(seed)
        plan, sccs = _plan_for(g)
        cyc = set()
        for comp in sccs:
            if len(comp) > 1:
                cyc.update(comp)
        hits += any(r[0] in cyc for r in plan)
    assert hits >= 6, f"only {hits}/12 seeds formed an in-cycle run"


@pytest.mark.parametrize("seed", [0, 3, 7, 10])
@bitwise_cpu_only
def test_random_feedback_linear_exact_bitwise(seed):
    """The same cycle shapes under the exact policy (fusion disabled by
    policy) stay BITWISE against the oracle — fusing under fast must not
    have perturbed the cycle semantics the exact path shares."""
    g, inp_id, out_id = _random_feedback_linear_graph(seed, exact=True)
    rng = np.random.default_rng(12_000 + seed)
    x = (rng.standard_normal(T) * 0.25).astype(np.float32)
    with precision.policy("exact"):
        outs, _, _ = dst.render(g, {str(inp_id): x})
    want = oracle_graph.evaluate(g, {inp_id: x}, T)[out_id]
    np.testing.assert_array_equal(np.asarray(outs)[0], want,
                                  err_msg=f"seed {seed}")


@pytest.mark.parametrize("seed", [1, 4, 8])
def test_random_feedback_linear_segmented_state_carry(seed):
    """Two chained half-renders through fused in-cycle runs equal the
    one-shot render: composite state rebuild + cycle-context carry at
    every block boundary AND the segment boundary."""
    g, inp_id, out_id = _random_feedback_linear_graph(seed)
    rng = np.random.default_rng(13_000 + seed)
    x = (rng.standard_normal(T) * 0.25).astype(np.float32)
    half = T // 2
    with precision.policy("fast"):
        cg = dst.compile_graph(g)
        full, _, _ = cg.render({str(inp_id): x})
        a, _, st = cg.render({str(inp_id): x[:half]})
        b, _, _ = cg.render({str(inp_id): x[half:]}, state=st)
    got = np.concatenate([np.asarray(a)[0], np.asarray(b)[0]])
    db = oracle.max_err_dbfs(got, np.asarray(full)[0])
    assert db <= -100.0, f"seed {seed}: {db:.1f} dBFS"


def test_in_cycle_fusion_contiguity_rules():
    """The planner's in-cycle preconditions: a linear pair whose ids are
    NOT consecutive in the cycle's execution order must not fuse (a
    non-member evaluates between them), and a signal-order-descending
    pair (its joint is a back edge carrying one block of delay) must
    not fuse either."""
    # descending ids: fbg created before lp, link lp -> fbg
    g = dst.Graph(IdSpace())
    inp = g.add("input")
    mixa = g.add("add")
    fbg = g.add("gain", level=0.4)       # id 2
    lp = g.add("low_pass", ratio=0.5)    # id 3
    out = g.add("output")
    g.connect(inp, "out", mixa, "a")
    g.connect(mixa, "out", lp, "in")
    g.connect(lp, "out", fbg, "in")      # pos[fbg] < pos[lp]: back edge
    g.connect(fbg, "out", mixa, "b")
    g.connect(lp, "out", out, "in")
    plan, _ = _plan_for(g)
    assert plan == [], plan

    # interleaved: a non-linear member's id falls between lp and fbg
    g2 = dst.Graph(IdSpace())
    inp2 = g2.add("input")
    mixa2 = g2.add("add")
    lp2 = g2.add("low_pass", ratio=0.5)            # id 2
    dist2 = g2.add("distort", mode="SoftClip", level=1.5)   # id 3
    fbg2 = g2.add("gain", level=0.4)               # id 4
    out2 = g2.add("output")
    g2.connect(inp2, "out", mixa2, "a")
    g2.connect(mixa2, "out", lp2, "in")
    g2.connect(lp2, "out", fbg2, "in")             # pos gap: dist2 between
    g2.connect(fbg2, "out", dist2, "in")
    g2.connect(dist2, "out", mixa2, "b")
    g2.connect(fbg2, "out", out2, "in")
    plan2, _ = _plan_for(g2)
    assert plan2 == [], plan2

    # both graphs still render correctly per-node
    rng = np.random.default_rng(42)
    x = (rng.standard_normal(T) * 0.25).astype(np.float32)
    for gg, iid, oid in ((g, inp.id, out.id), (g2, inp2.id, out2.id)):
        with precision.policy("fast"):
            outs, _, _ = dst.render(gg, {str(iid): x})
        want = oracle_graph.evaluate(gg, {iid: x}, T)[oid]
        db = oracle.max_err_dbfs(np.asarray(outs)[0], want)
        assert db <= -80.0, db


def test_config5_in_cycle_pair_fuses():
    """config5's lp -> fbg pair inside the feedback SCC must plan as an
    in-cycle run (the r4 perf lever), and the fused render must match
    the oracle."""
    from dsp_stuff_tpu.models import config5_feedback_16node
    g, meta = config5_feedback_16node()
    plan, sccs = _plan_for(g)
    cyc = set()
    for comp in sccs:
        if len(comp) > 1:
            cyc.update(comp)
    in_cycle = [r for r in plan if r[0] in cyc]
    assert in_cycle, f"lp->fbg did not plan: {plan}"
    assert any(len(r) == 2 for r in in_cycle), in_cycle


@pytest.mark.parametrize("seed", [2, 7])
def test_random_linear_chain_streaming_matches_offline(seed):
    """Fused runs inside the StreamSession scan body (process_many) and
    the per-block path must match the offline render -- the cascade's
    trace-time constants have to hoist out of the block scan exactly
    like the per-node solvers'."""
    from dsp_stuff_tpu.runtime.stream import StreamSession
    g, inp_id, out_id = _random_linear_chain_graph(seed)
    rng = np.random.default_rng(10_000 + seed)
    x = (rng.standard_normal(T) * 0.25).astype(np.float32)
    with precision.policy("fast"):
        offline, _, _ = dst.render(g, {str(inp_id): x})
        sess = StreamSession(g)
        got1 = sess.process_many({str(inp_id): x[: T // 2]})[0]
        got2 = sess.process_many({str(inp_id): x[T // 2:]})[0]
    got = np.concatenate([got1, got2])
    db = oracle.max_err_dbfs(got, np.asarray(offline)[0])
    assert db <= -90.0, f"seed {seed}: {db:.1f} dBFS"


# ---------------------------------------------------------------------------
# round-5: JOINT megakernel-planner fuzz (verdict #7).  Graphs where mega
# chain segments (with shaper + comb members and tap stages), fused cycle
# block programs AND linear runs can all fire on the same topology,
# checked against the oracle under the fast policy.  Engagement is proven
# by spies on the fused entry points (not just plan metadata): a planner
# regression that silently stops fusing fails the non-vacuity test.

def _random_mega_cycle_graph(seed):
    """input -> mega-fusable chain (linear + shaper + comb pool, with
    occasional taps into analysis sinks / second outputs) -> feedback
    loop of cycle-program-capable members -> output."""
    rng = np.random.default_rng(seed)
    g = dst.Graph(IdSpace())
    inp = g.add("input")

    def draw_member():
        r = rng.random()
        if r < 0.15:
            return g.add("gain", level=float(rng.uniform(0.3, 1.5)))
        if r < 0.3:
            return g.add("low_pass", ratio=float(rng.uniform(0.1, 0.9)))
        if r < 0.45:
            return g.add("high_pass", ratio=float(rng.uniform(0.05, 0.6)))
        if r < 0.6:
            p1, p2 = rng.uniform(-0.5, 0.5, 2)
            return g.add("biquad", a0=1.0, a1=float(-(p1 + p2)),
                         a2=float(p1 * p2),
                         b0=float(rng.uniform(0.3, 0.9)),
                         b1=float(rng.uniform(-0.3, 0.3)), b2=0.0)
        if r < 0.72:
            return g.add("distort", mode=str(rng.choice(
                ["SoftClip", "Tanh", "HardClip", "RecipSoftClip"])),
                level=float(rng.uniform(0.5, 4.0)))
        if r < 0.84:
            return g.add("chebyshev",
                         level_pos=float(rng.uniform(0.5, 4.0)),
                         level_neg=float(rng.uniform(0.5, 4.0)))
        return g.add("reverb", seconds=float(rng.uniform(0.003, 0.012)),
                     decay=float(rng.uniform(0.2, 0.6)))

    prev = inp
    taps = []
    for _ in range(int(rng.integers(3, 7))):
        n = draw_member()
        g.connect(prev, "out", n, "in")
        if rng.random() < 0.3:               # mid-chain tap
            wv = g.add("wave_view")
            g.connect(n, "out", wv, "in")
            taps.append(n.id)
        prev = n

    # feedback loop: add -> 1..3 members -> gain -> back into add
    mixa = g.add("add")
    g.connect(prev, "out", mixa, "a")
    loop_prev = mixa
    for _ in range(int(rng.integers(1, 4))):
        n = draw_member()
        g.connect(loop_prev, "out", n, "in")
        loop_prev = n
    fbg = g.add("gain", level=float(rng.uniform(0.2, 0.45)))
    g.connect(loop_prev, "out", fbg, "in")
    g.connect(fbg, "out", mixa, "b")

    out = g.add("output")
    g.connect(loop_prev, "out", out, "in")
    return g, inp.id, out.id


class _Spy:
    """Wrap a fused entry point, recording call args."""

    def __init__(self, module, name):
        self.module, self.name = module, name
        self.calls = []

    def __enter__(self):
        self._orig = getattr(self.module, self.name)

        def wrapper(*a, **k):
            self.calls.append(a)
            return self._orig(*a, **k)

        setattr(self.module, self.name, wrapper)
        return self

    def __exit__(self, *exc):
        setattr(self.module, self.name, self._orig)


def _render_fast_with_spies(g, ext):
    from dsp_stuff_tpu.ops import chain_segment as cs_mod
    from dsp_stuff_tpu.ops import cycle_segment as cyc_mod
    with _Spy(cs_mod, "chain_segment") as s_chain, \
            _Spy(cyc_mod, "cycle_segment") as s_cyc:
        with precision.policy("fast"):
            outs, _, _ = dst.render(g, ext)
    return outs, s_chain.calls, s_cyc.calls


_MEGA_CYCLE_SEEDS = list(range(10))


@pytest.mark.parametrize("seed", _MEGA_CYCLE_SEEDS)
def test_random_mega_cycle_fast_vs_oracle(seed):
    """Fast renders through whatever the three stacked fusion tiers do
    on joint topologies must match the per-node oracle interpreter —
    planner-interaction bugs (mega x linear x cycle on one graph) are
    the likeliest latent class after three tiers."""
    g, inp_id, out_id = _random_mega_cycle_graph(seed)
    rng = np.random.default_rng(20_000 + seed)
    x = (rng.standard_normal(T) * 0.25).astype(np.float32)
    got, _, _ = _render_fast_with_spies(g, {str(inp_id): x})
    want = oracle_graph.evaluate(g, {inp_id: x}, T)[out_id]
    assert np.isfinite(want).all(), "oracle blew up — bad generator params"
    db = oracle.max_err_dbfs(np.asarray(got)[0], want)
    # On chip the intrinsic fast-f32 class through random feedback
    # topologies reaches -75..-77 dBFS (seed 0 measured: fused -77.4,
    # per-node scan -75.5 — the UNFUSED path is the worse one, so this
    # is backend conditioning, not a fusion bug); CPU keeps -80.
    from conftest import ON_TPU
    assert db <= (-72.0 if ON_TPU else -80.0), f"seed {seed}: {db:.1f} dBFS"


def test_mega_cycle_fuzz_not_vacuous():
    """Across the seeds, BOTH fused entry points must actually engage,
    mega segments must include shaper+comb members, and tap stages must
    occur (proven by spying the calls, not by plan metadata alone)."""
    chain_hits = cyc_hits = tap_hits = rich_hits = 0
    for seed in _MEGA_CYCLE_SEEDS:
        g, inp_id, _ = _random_mega_cycle_graph(seed)
        x = np.zeros(T, np.float32)
        _, chain_calls, cyc_calls = _render_fast_with_spies(
            g, {str(inp_id): x})
        chain_hits += bool(chain_calls)
        cyc_hits += bool(cyc_calls)
        for call in chain_calls:
            stages = call[1]
            kinds = {st[0] for st in stages}
            tap_hits += "tap" in kinds
            rich_hits += ("ew" in kinds and "comb" in kinds)
    assert chain_hits >= 5, f"chain segments engaged on {chain_hits}/10"
    assert cyc_hits >= 5, f"cycle programs engaged on {cyc_hits}/10"
    assert tap_hits >= 2, f"tap stages occurred {tap_hits} times"
    assert rich_hits >= 2, f"shaper+comb segments occurred {rich_hits} times"


@pytest.mark.parametrize("seed", [1, 4, 7])
def test_random_mega_cycle_segmented_state_carry(seed):
    """Two chained half-renders through the joint fused paths equal the
    one-shot render (tap-split cascades, comb rings, cycle registers)."""
    g, inp_id, out_id = _random_mega_cycle_graph(seed)
    rng = np.random.default_rng(21_000 + seed)
    x = (rng.standard_normal(T) * 0.25).astype(np.float32)
    half = T // 2
    with precision.policy("fast"):
        cg = dst.compile_graph(g)
        full, _, _ = cg.render({str(inp_id): x})
        a, _, st = cg.render({str(inp_id): x[:half]})
        b, _, _ = cg.render({str(inp_id): x[half:]}, state=st)
    got = np.concatenate([np.asarray(a)[0], np.asarray(b)[0]])
    db = oracle.max_err_dbfs(got, np.asarray(full)[0])
    assert db <= -100.0, f"seed {seed}: {db:.1f} dBFS"
