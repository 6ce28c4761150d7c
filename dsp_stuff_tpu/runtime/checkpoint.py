"""Checkpoint / resume.

The reference persists graph topology + per-node settings only (eframe
storage key "graph_state", runtime.rs:540-543; manual Save/Load JSON,
runtime.rs:463-494) — DSP state (filter z, delay contents, oscillator
phase) is NOT saved; restore starts from silence (SURVEY.md section 5).

This module covers both levels:

* ``save_graph`` / ``load_graph`` (graph.py) — the reference-compatible
  JSON, for topology+settings parity;
* ``save_checkpoint`` / ``load_checkpoint`` — an extension that also
  captures the live DSP state pytree and (optionally) a fitted params
  pytree, so long renders and streaming sessions resume mid-audio
  bit-exactly.  Format: the graph JSON plus an .npz of flattened pytree
  leaves keyed by their tree paths.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from dsp_stuff_tpu.graph import Graph, dumps_graph, loads_graph


def _flatten(tree, prefix: str):
    flat = {}
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        key = prefix + jax.tree_util.keystr(path)
        flat[key] = np.asarray(leaf)
    return flat


def _tree_def(tree):
    return jax.tree_util.tree_flatten_with_path(tree)[1]


def save_checkpoint(path: str, graph: Graph, state=None, params=None,
                    meta: dict | None = None) -> None:
    """Write ``path`` (.npz) + ``path + '.graph.json'``."""
    arrays = {}
    if state is not None:
        arrays.update(_flatten(state, "state"))
    if params is not None:
        arrays.update(_flatten(params, "params"))
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    np.savez(path, **arrays)
    with open(path + ".graph.json", "w") as f:
        f.write(dumps_graph(graph))


def load_checkpoint(path: str):
    """Returns (graph, state, params, meta).  state/params are rebuilt by
    re-initializing from the graph and overwriting leaves by path key, so
    they deserialize into the exact pytree structure the compiler expects."""
    from dsp_stuff_tpu.compiler.compile import compile_graph

    with open(path + ".graph.json") as f:
        graph = loads_graph(f.read())
    data = np.load(path if path.endswith(".npz") else path + ".npz",
                   allow_pickle=False)
    meta = json.loads(bytes(data["__meta__"]).decode()) if "__meta__" in data \
        else {}

    cg = compile_graph(graph)
    state = cg.init_state()
    params = cg.init_params()

    def restore(tree, prefix):
        leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
        new = []
        found = 0
        for path_, leaf in leaves:
            key = prefix + jax.tree_util.keystr(path_)
            if key in data:
                new.append(data[key])
                found += 1
            else:
                new.append(leaf)
        return jax.tree_util.tree_unflatten(treedef, new), found

    state, n_state = restore(state, "state")
    params, n_params = restore(params, "params")
    return graph, (state if n_state else None), \
        (params if n_params else None), meta
