"""Amp matching: recover distortion-chain settings from a target render.

Builds gain -> overdrive -> low_pass, renders a 'secret' setting as the
target, then gradient-fits the sliders from defaults (train/fit.py).
"""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

import dsp_stuff_tpu as dst
from dsp_stuff_tpu.ids import IdSpace
from dsp_stuff_tpu.train.fit import fit
from dsp_stuff_tpu.utils import precision

g = dst.Graph(IdSpace())
inp = g.add("input")
gn = g.add("gain", level=1.0)
od = g.add("overdrive", boost=5.0, drive=0.5, level=0.8)
lp = g.add("low_pass", ratio=0.3)
out = g.add("output")
g.chain(inp, gn, od, lp, out)

with precision.policy("fast"):
    cg = dst.compile_graph(g)
    x = (np.random.default_rng(0).standard_normal((8, 4096)) * 0.3
         ).astype(np.float32)
    ext = {str(inp.id): x}

    secret = cg.init_params()
    secret[str(gn.id)]["level"] = jnp.float32(2.0)
    secret[str(lp.id)]["ratio"] = jnp.float32(0.7)

    state = cg.init_state()
    _, outs, _ = jax.vmap(cg.fn, in_axes=(None, 0, None))(state, ext, secret)
    target = jnp.stack([outs[i] for i in cg.output_ids], axis=-2)

    params, losses = fit(cg, ext, target, steps=400,
                         optimizer=optax.adam(0.03), verbose=True)

print("\nrecovered:")
# note: gain.level and the overdrive stage are jointly non-identifiable
# (several settings produce near-identical output); the loss is what counts
print(f"  gain.level  = {float(params[str(gn.id)]['level']):.3f}  (true 2.0)")
print(f"  lowpass.ratio = {float(params[str(lp.id)]['ratio']):.3f}  (true 0.7)")
print(f"final loss {losses[-1]:.2e}")
