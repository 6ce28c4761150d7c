"""Per-op measurement: fused-run state-dim cap 4 (2+2 split) vs 8 (one
solve) on a 4-biquad EQ stack, batch 512 x 10 s, real TPU.

VERDICT r3 item 5: raise MAX_RUN_DIM to 8 and measure; if the [C, 8]
ends mat-vec erases the win, keep 4 and document.  Run:

    python tools/measure_rundim.py

Timing protocol per CLAUDE.md: chain renders through carried state
inside one jitted lax.scan, one scalar host fetch as the barrier.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import dsp_stuff_tpu as dst
from dsp_stuff_tpu.ops import cascade
from dsp_stuff_tpu.utils import precision

SR = 48_000
B = 512
T = SR * 10
N_CHAIN = 4
N_TIMED = 3

# four distinct stable biquads (gentle EQ-ish shapes)
BQS = [
    dict(a0=1.0, a1=-0.24, a2=0.05, b0=0.758, b1=0.1, b2=0.02),
    dict(a0=1.0, a1=0.31, a2=0.12, b0=0.6, b1=-0.15, b2=0.05),
    dict(a0=1.0, a1=-0.52, a2=0.2, b0=0.9, b1=0.05, b2=0.0),
    dict(a0=1.0, a1=0.18, a2=0.07, b0=0.7, b1=0.12, b2=0.03),
]


def build_eq():
    g = dst.Graph()
    inp = g.add("input")
    ns = [g.add("biquad", **p) for p in BQS]
    out = g.add("output")
    g.chain(inp, *ns, out)
    return g, inp.id


def timed(g, inp_id, x):
    with precision.policy("fast"):
        cg = dst.compile_graph(g)
        state = jax.device_put(cg.broadcast_state(cg.init_state(), (B,)))
        ext = jax.device_put({str(inp_id): x})
        vfn = jax.vmap(cg.fn, in_axes=(cg.state_axes(), 0, None),
                       out_axes=(cg.state_axes(), 0, 0))
        oid = cg.output_ids[0]

        @jax.jit
        def run(state, ext):
            def body(st, _):
                st, outs, _aux = vfn(st, ext, None)
                return st, jnp.sum(outs[oid])
            st, sums = jax.lax.scan(body, state, None, length=N_CHAIN)
            return jnp.sum(sums)

        float(run(state, ext))
        best = float("inf")
        for _ in range(N_TIMED):
            t0 = time.perf_counter()
            float(run(state, ext))
            best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((B, T)) * 0.25).astype(np.float32)
    g, inp_id = build_eq()

    for cap in (4, 8):
        cascade.MAX_RUN_DIM = cap
        cascade._cascade_constants.cache_clear()
        best = timed(g, inp_id, x)
        agg = B * (T / SR) * N_CHAIN / best
        print(f"cap={cap}: best={best*1e3:.1f} ms  "
              f"aggregate={agg:,.0f} audio-s/s")


if __name__ == "__main__":
    main()
