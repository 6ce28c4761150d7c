"""Batched, sharded rendering: 64 stereo streams through the 16-node graph.

Run on any backend; on a multi-device mesh the stream axis shards with no
code changes (XLA inserts nothing — streams are independent).
"""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax

import dsp_stuff_tpu as dst
from dsp_stuff_tpu.models import config5_feedback_16node
from dsp_stuff_tpu.parallel import mesh as pmesh

g, meta = config5_feedback_16node()
cg = dst.compile_graph(g)

S, T = 64, 48_000
x = (np.random.default_rng(0).standard_normal((S, 1, T)) * 0.2
     ).astype(np.float32)

m = pmesh.make_mesh()
outs, aux, state = pmesh.render_sharded(cg, x, m)
print("rendered", outs.shape, "on", len(m.devices.flat), "device(s)")
print("output sharding:", outs.sharding)
