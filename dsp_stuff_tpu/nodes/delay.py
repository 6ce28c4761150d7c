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
    of the reference's reallocation).

    State is a circular buffer + write position: inside feedback cycles
    (one 128-sample block per step) the update is a T-element gather +
    scatter instead of rewriting the whole [D] line every block (for a
    0.15 s delay that concat moved 56x more bytes per block than the
    audio itself).  ``pos`` is lockstep (shared across streams)."""

    shared_state_keys = ("pos",)

    @staticmethod
    def init_state(cfg, block_size):
        D = delay_samples(float(cfg["seconds"]))
        return {"ring": jnp.zeros((D,), jnp.float32),
                "pos": jnp.int32(0)}

    @staticmethod
    def process_seq(params, state, inputs):
        ring, pos = state["ring"], state["pos"]
        D = ring.shape[-1]
        # canonicalize (oldest-first) if a block path left pos != 0
        ring = jnp.roll(ring, -pos, axis=-1)
        y, ring = feedback_comb(inputs["in"], params["decay"], D, ring)
        return {"out": y}, {"ring": ring, "pos": jnp.int32(0)}

    @staticmethod
    def process_block(params, state, inputs):
        x = inputs["in"]
        ring, pos = state["ring"], state["pos"]
        D = ring.shape[-1]
        T = x.shape[-1]
        if T > D:      # block longer than the line: use the general path
            return Reverb.process_seq(params, state, inputs)
        from dsp_stuff_tpu.utils.precision import exact_mul
        idx = (pos + jnp.arange(T, dtype=jnp.int32)) % D
        delayed = jnp.take(ring, idx, axis=-1)        # the T oldest samples
        y = x + exact_mul(delayed, params["decay"])
        ring = ring.at[..., idx].set(y)               # overwrite the oldest
        return {"out": y}, {"ring": ring, "pos": (pos + T) % D}


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
