"""Reverb node -- actually a feedback echo/delay (see ops/delay_line.py)."""

from __future__ import annotations

import jax.numpy as jnp

from dsp_stuff_tpu.registry import register_node, ParamSpec
from dsp_stuff_tpu.ops.delay_line import feedback_comb, delay_samples


@register_node(
    title="Reverb", cfg_name="reverb",
    description="Repeat/ echo sounds with a given delay and decay factor",
    inputs=("in",), outputs=("out",),
    params=(
        ParamSpec("seconds", 0.0, 1.0, 0.5, suffix="s", label="Delay",
                  static=True),
        ParamSpec("decay", 0.0, 1.0, 0.5),
    ),
)
class Reverb:
    """y[n] = x[n] + decay * y[n-D], D = max(int(seconds*48000), 128)
    (reverb.rs:76-111, delay length reverb.rs:57).  The reference's ring is
    freshly zero-filled whenever `seconds` changes (reverb.rs:55-71); with
    static per-render params the line starts zeroed, which matches.

    `seconds` is a structure parameter: it fixes the delay-line length, so
    it is compiled statically (changing it triggers a re-trace, the analog
    of the reference's reallocation)."""

    @staticmethod
    def init_state(cfg, block_size):
        D = delay_samples(float(cfg["seconds"]), block_size=block_size)
        return {"ring": jnp.zeros((D,), jnp.float32)}

    @staticmethod
    def process_seq(params, state, inputs):
        D = state["ring"].shape[-1]
        y, ring = feedback_comb(inputs["in"], params["decay"], D, state["ring"])
        return {"out": y}, {"ring": ring}
