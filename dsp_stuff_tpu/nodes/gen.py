"""Signal Generator node."""

from __future__ import annotations

import jax.numpy as jnp

from dsp_stuff_tpu.registry import register_node, ParamSpec, SelectSpec
from dsp_stuff_tpu.ops.gen import oscillator


@register_node(
    title="Signal Generator", cfg_name="signal_gen",
    description="Generate a signal with a given frequency and amplitude",
    outputs=("out",),
    params=(
        ParamSpec("amplitude", -1.0, 1.0, 0.5, as_input=True),
        ParamSpec("frequency", 0.1, 20000.0, 100.0, as_input=True,
                  logarithmic=True, suffix=" hz"),
        SelectSpec("mode", ("Sine", "Triangle", "Square", "Constant"), "Sine"),
    ),
)
class SignalGen:
    """Sine/Triangle/Square/Constant with a persistent block-wrapped phase
    clock (signal_gen.rs:57-108), square-wave quirk included."""

    # the oscillator needs to know the render length; the compiler passes it
    # via a zero-valued driver input of the right shape
    needs_length = True

    @staticmethod
    def init_state(cfg, block_size):
        return {"clock": jnp.float32(0.0)}

    @staticmethod
    def process_seq(params, state, inputs, *, T=None, block_size=128):
        if T is None:
            # infer from a modulated param if present
            for v in params.values():
                if hasattr(v, "shape") and getattr(v, "ndim", 0) > 0:
                    T = v.shape[-1]
                    break
        # the per-block clock wrap + intra-block square comparison are
        # defined on the reference's 128 frame (signal_gen.rs:57-103)
        # regardless of the compile block size (which must tile 128 --
        # enforced by compile_graph)
        y, clock = oscillator(params["mode"], params["amplitude"],
                              params["frequency"], T, state["clock"],
                              block_size=128)
        return {"out": y}, {"clock": clock}
