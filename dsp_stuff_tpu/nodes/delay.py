"""Delay-family nodes: Reverb (feedback echo) and Chorus (modulated tap)."""

from __future__ import annotations

import jax.numpy as jnp

from dsp_stuff_tpu.registry import register_node, ParamSpec
from dsp_stuff_tpu.ops.delay_line import feedback_comb, delay_samples
from dsp_stuff_tpu.ops.modfx import modulated_delay, max_delay_samples


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
        D = delay_samples(float(cfg["seconds"]))
        return {"ring": jnp.zeros((D,), jnp.float32)}

    @staticmethod
    def process_seq(params, state, inputs):
        D = state["ring"].shape[-1]
        y, ring = feedback_comb(inputs["in"], params["decay"], D, state["ring"])
        return {"out": y}, {"ring": ring}


@register_node(
    title="Chorus", cfg_name="chorus",
    description="Sine-modulated fractional delay (chorus/flanger/vibrato)",
    inputs=("in",), outputs=("out",),
    params=(
        ParamSpec("rate", 0.05, 10.0, 1.0, suffix=" hz", as_input=True),
        ParamSpec("depth", 0.0, 0.02, 0.003, suffix="s", static=True),
        ParamSpec("base", 0.0, 0.05, 0.01, suffix="s", static=True),
        ParamSpec("mix", 0.0, 1.0, 0.5, as_input=True),
    ),
)
class Chorus:
    """Extension node (no reference analog; BASELINE.json config #2 needs
    modulated fractional taps).  base/depth fix the history length, so they
    are structural; rate and mix are modulatable/differentiable.  See
    ops/modfx.py for the vectorized gather lowering.

    The sample clock t0 is LOCKSTEP state: all streams of a batched render
    advance together, so it stays a shared scalar under vmap (keeping the
    LFO tap trajectory shared -> fast row-gather path)."""

    shared_state_keys = ("t0",)

    @staticmethod
    def init_state(cfg, block_size):
        L = max_delay_samples(float(cfg["base"]), float(cfg["depth"]))
        return {"hist": jnp.zeros((L,), jnp.float32),
                "t0": jnp.int32(0)}

    @staticmethod
    def process_seq(params, state, inputs):
        y, hist, t0 = modulated_delay(
            inputs["in"], params["rate"], params["depth"], params["base"],
            params["mix"], state["hist"], state["t0"])
        return {"out": y}, {"hist": hist, "t0": t0}
