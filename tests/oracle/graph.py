"""Block-wise graph-level oracle: an independent NumPy interpreter of the
compiled-graph semantics, built on the per-node oracles (tests/oracle).

Evaluates any supported graph 128 samples at a time, replicating the
framework's *defined* semantics end to end:

* components in SCC-condensation topo order, members ascending id;
* an intra-component edge from a not-yet-evaluated member reads the
  PREVIOUS block (one BLOCK of feedback latency; zeros at block 0) —
  compiler/compile.py _eval_cycle's contract;
* fan-in: sum in link insertion order / (n + 1e-4) in f32 (node.rs:162-194);
* as_input modulation ports map the averaged signal through
  [-1,1] -> slider range (dsp-stuff-derive lib.rs:140-148);
* unconnected inputs are silence; Output nodes average their fan-in.

Evaluating acyclic nodes block-by-block instead of full-sequence is
semantically identical for every supported node (all causal; the
block-quirky ones — Fuzz, signal_gen — are pinned to the 128 grid by both
sides).  NOT supported: oversample != "1" (its polyphase halo is
non-causal at block granularity — covered by the dedicated config3 test),
muff (documented divergence, no oracle).
"""

from __future__ import annotations

import numpy as np

import oracle

F32 = np.float32
BUF = 128


def _h(vals):
    return oracle.fanin_average(vals)


class _NodeState:
    __slots__ = ("kind", "st")

    def __init__(self, kind, st):
        self.kind = kind
        self.st = st


def _init_state(node):
    k = node.spec.cfg_name
    p = node.params
    if k == "biquad":
        return _NodeState(k, None)
    if k in ("low_pass", "high_pass"):
        return _NodeState(k, F32(0.0))
    if k == "envelope":
        return _NodeState(k, F32(0.0))
    if k == "fir":
        from collections import deque
        return _NodeState(k, deque())
    if k == "reverb":
        D = max(int(F32(p["seconds"]) * F32(48000.0)), 128)
        return _NodeState(k, np.zeros(D, F32))
    if k == "signal_gen":
        return _NodeState(k, F32(0.0))
    if k == "chorus":
        L = int(np.ceil((p["base"] + p["depth"]) * 48000)) + 2
        return _NodeState(k, (np.zeros(L, F32), 0))
    return _NodeState(k, None)


_DISTORT = {
    "HardClip": oracle.hard_clip, "SoftClip": oracle.soft_clip,
    "Tanh": oracle.tanh_clip, "RecipSoftClip": oracle.recip_soft_clip,
    "Sin": oracle.sin_shape, "Atan": oracle.atan_shape,
    "Square": oracle.square_shape, "Chebyshev4": oracle.chebyshev4,
    "Fuzz": None,   # dispatched specially (block max)
}


def _step(node, ns, ins, params):
    """One 128-block for one node; ins maps port -> f32 block."""
    k = ns.kind
    p = params
    if k == "gain":
        return {"out": (ins["in"] * p["level"]).astype(F32)}
    if k == "add":
        return {"out": (ins["a"] + ins["b"]).astype(F32)}
    if k == "mix":
        r = p["ratio"]
        return {"out": ((ins["b"] * r).astype(F32)
                        + (ins["a"] * (F32(1.0) - r)).astype(F32)
                        ).astype(F32)}
    if k == "mux":
        return {"out": ins["a"] if p["in_port"] == "A" else ins["b"]}
    if k == "demux":
        z = np.zeros_like(ins["in"])
        if p["out_port"] == "A":
            return {"a": ins["in"], "b": z}
        return {"a": z, "b": ins["in"]}
    if k == "distort":
        assert str(p.get("oversample", "1")) == "1", "oracle: oversample"
        if p["mode"] == "Fuzz":
            return {"out": oracle.fuzz(ins["in"], p["level"], BUF)}
        return {"out": _DISTORT[p["mode"]](ins["in"], p["level"])}
    if k == "overdrive":
        assert str(p.get("oversample", "1")) == "1", "oracle: oversample"
        return {"out": oracle.overdrive(ins["in"], p["boost"], p["drive"],
                                        p["level"])}
    if k == "chebyshev":
        return {"out": oracle.chebyshev_asym(ins["in"], p["level_pos"],
                                             p["level_neg"])}
    if k == "biquad":
        a0 = F32(p["a0"])
        y, ns.st = oracle.biquad_df1(ins["in"], a0, p["a1"], p["a2"],
                                     p["b0"], p["b1"], p["b2"], ns.st)
        return {"out": y}
    if k == "low_pass":
        y, ns.st = oracle.low_pass(ins["in"], p["ratio"], ns.st)
        return {"out": y}
    if k == "high_pass":
        y, ns.st = oracle.high_pass(ins["in"], p["ratio"], ns.st)
        return {"out": y}
    if k == "envelope":
        y, ns.st = oracle.envelope(ins["in"], p["attack"], p["release"],
                                   ns.st)
        return {"out": y}
    if k == "fir":
        taps = np.asarray(p["taps"], np.float64)
        mode = p.get("mode", "Balanced")
        y, ns.st = oracle.fir(ins["in"], taps, mode, ns.st)
        return {"out": y}
    if k == "reverb":
        y, ns.st = oracle.reverb(ins["in"], p["seconds"], p["decay"], ns.st)
        return {"out": y}
    if k == "signal_gen":
        T = BUF
        y, ns.st = oracle.signal_gen(p["mode"], p["amplitude"],
                                     p["frequency"], T, ns.st, BUF)
        return {"out": y}
    if k == "chorus":
        hist, t0 = ns.st
        y, hist, t0 = oracle.chorus(ins["in"], p["rate"], p["depth"],
                                    p["base"], p["mix"], hist, t0)
        ns.st = (hist, t0)
        return {"out": y}
    raise NotImplementedError(k)


def evaluate(graph, ext, T: int):
    """Render ``graph`` with the block-wise oracle.

    ext -- {input_node_id(int): np [T] f32}
    Returns outs {output_node_id: np [T] f32}.
    """
    from dsp_stuff_tpu.compiler.scc import condensation_topo_order
    from dsp_stuff_tpu.compiler.compile import _active_nodes
    from dsp_stuff_tpu.registry import ParamSpec

    assert T % BUF == 0
    active = _active_nodes(graph)
    nodes = {nid: n for nid, n in graph.nodes.items() if nid in active}
    edges = {nid: set() for nid in nodes}
    for l in graph.links:
        if l.src in nodes and l.dst in nodes:
            edges[l.src].add(l.dst)
    comps = condensation_topo_order(sorted(nodes), edges)

    states = {nid: _init_state(n) for nid, n in nodes.items()}
    out_ids = [nid for nid, n in nodes.items()
               if getattr(n.spec.impl, "graph_output", False)]
    outs = {nid: np.zeros(T, F32) for nid in out_ids}
    prev: dict[tuple[int, str], np.ndarray] = {}
    zero = np.zeros(BUF, F32)

    for b0 in range(0, T, BUF):
        cur: dict[tuple[int, str], np.ndarray] = {}

        def port_avg(nid, port):
            srcs = []
            for l in graph.in_links(nid, port):
                key = (l.src, l.src_port)
                srcs.append(cur.get(key, prev.get(key, zero)))
            if not srcs:
                return zero, 0
            return _h(srcs), len(srcs)

        for comp in comps:
            for nid in sorted(comp):
                node = nodes[nid]
                spec = node.spec
                if getattr(spec.impl, "graph_input", False):
                    cur[(nid, "out")] = np.asarray(
                        ext[nid][b0:b0 + BUF], F32)
                    continue
                if spec.is_sink or getattr(spec.impl, "graph_output", False):
                    continue        # handled below / no outputs
                ins = {}
                for port in spec.inputs:
                    ins[port], _ = port_avg(nid, port)
                params = {}
                for ps in spec.params:
                    if isinstance(ps, ParamSpec) and ps.as_input:
                        sig, n = port_avg(nid, ps.name)
                        if n > 0:
                            params[ps.name] = oracle.mod_map(sig, ps.lo,
                                                             ps.hi)
                        else:
                            params[ps.name] = F32(node.params[ps.name])
                    elif isinstance(ps, ParamSpec):
                        params[ps.name] = F32(node.params[ps.name])
                    else:
                        params[ps.name] = node.params[ps.name]
                res = _step(node, states[nid], ins, params)
                for port, val in res.items():
                    cur[(nid, port)] = val

        for nid in out_ids:
            sig, _ = port_avg(nid, "in")
            outs[nid][b0:b0 + BUF] = sig
        prev = cur
    return outs
