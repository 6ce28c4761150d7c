"""Distortion / waveshaping nodes: Distort, Overdrive, Chebyshev, Muff."""

from __future__ import annotations

import jax.numpy as jnp

from dsp_stuff_tpu.registry import register_node, ParamSpec, SelectSpec
from dsp_stuff_tpu.ops import shaping
from dsp_stuff_tpu.ops.oversample import oversampled


@register_node(
    title="Distort", cfg_name="distort", description="Distortion effects",
    inputs=("in",), outputs=("out",),
    params=(
        ParamSpec("level", 0.0, 30.0, 0.0, as_input=True),
        SelectSpec("mode", tuple(shaping.DISTORT_MODES), "SoftClip"),
        # extension beyond the reference (whose Distort aliases): polyphase
        # anti-aliased shaping at 2/4/8x rate (ops/oversample.py)
        SelectSpec("oversample", ("1", "2", "4", "8"), "1"),
    ),
)
class Distort:
    """9 waveshaper modes dispatched on a static enum (distort.rs:184-194).
    Fuzz normalizes per processing block, so it needs the block size."""

    needs_length = True

    @staticmethod
    def process_seq(params, state, inputs, *, T=None, block_size=128):
        R = int(params.get("oversample", "1"))
        if params["mode"] == "Fuzz":
            # block-max normalization is defined at the base rate on the
            # reference's fixed 128 frame (distort.rs:148-151) regardless
            # of the compile block size; the quirk is kept un-oversampled
            y = shaping.fuzz(inputs["in"], params["level"], 128)
        elif R > 1:
            y = oversampled(shaping.DISTORT_MODES[params["mode"]],
                            inputs["in"], R, params["level"])
        else:
            y = shaping.DISTORT_MODES[params["mode"]](inputs["in"],
                                                      params["level"])
        return {"out": y}, state


@register_node(
    title="Overdrive", cfg_name="overdrive", description="Overdrive",
    inputs=("in",), outputs=("out",),
    params=(
        ParamSpec("boost", 0.0, 30.0, 0.0, as_input=True),
        ParamSpec("drive", 0.0, 1.0, 0.0, as_input=True),
        ParamSpec("level", 0.0, 1.0, 0.0, as_input=True),
        SelectSpec("oversample", ("1", "2", "4", "8"), "1"),
    ),
)
class Overdrive:
    """atan overdrive (overdrive.rs:31-43); optional anti-aliased
    oversampling (extension, ops/oversample.py)."""

    @staticmethod
    def process_seq(params, state, inputs):
        R = int(params.get("oversample", "1"))
        if R > 1:
            y = oversampled(shaping.overdrive, inputs["in"], R,
                            params["boost"], params["drive"], params["level"])
        else:
            y = shaping.overdrive(inputs["in"], params["boost"],
                                  params["drive"], params["level"])
        return {"out": y}, state


@register_node(
    title="Chebyshev", cfg_name="chebyshev", description="Chebyshev Distortion",
    inputs=("in",), outputs=("out",),
    params=(
        ParamSpec("level_pos", 0.0, 50.0, 0.0),
        ParamSpec("level_neg", 0.0, 50.0, 0.0),
    ),
)
class Chebyshev:
    """Asymmetric tanh shaper (chebyshev.rs:28-42)."""

    @staticmethod
    def process_seq(params, state, inputs):
        y = shaping.chebyshev_asym(inputs["in"], params["level_pos"],
                                   params["level_neg"])
        return {"out": y}, state


@register_node(
    title="Muff", cfg_name="muff", description="Big Muff",
    inputs=("in",), outputs=("out",),
    params=(
        ParamSpec("toan", 0.0, 1.0, 0.5),
        ParamSpec("level", 0.0, 1.0, 0.5),
        ParamSpec("sustain", 0.0, 1.0, 0.5),
    ),
)
class Muff:
    """Big Muff Pi-style fuzz.

    The reference's DSP body lives in an unvendored external GPL crate
    (muff.rs:6,45 -- `dsp_stuff_gpl::muff::perform(input, output, toan,
    level, sustain, &mut MuffState)`), so only its interface is knowable.
    This is a license-clean re-derivation of the classic Big Muff topology:
    sustain-scaled gain into a soft clipper, a tone-stack crossfade between
    a one-pole low-pass and high-pass, then output level.  Interface and
    parameter ranges match the reference; sample values intentionally do
    not claim parity (documented divergence).
    """

    @staticmethod
    def init_state(cfg, block_size):
        import jax.numpy as jnp
        return {"lp_z": jnp.float32(0.0)}

    @staticmethod
    def process_seq(params, state, inputs):
        from dsp_stuff_tpu.ops.scan import first_order_affine
        x = inputs["in"]
        sustain = jnp.asarray(params["sustain"], jnp.float32)
        toan = jnp.asarray(params["toan"], jnp.float32)
        level = jnp.asarray(params["level"], jnp.float32)
        # input gain: 1..~100 with sustain
        g = 1.0 + sustain * 99.0
        v = jnp.tanh(x * g)
        # tone stack: crossfade LP (toan=0) <-> HP (toan=1); both legs share
        # the same one-pole at ~500 Hz (r = exp(-2*pi*fc/sr) ~= 0.9367),
        # since hp = v - lp
        r = 0.93669     # python float: trace-time-constant tap matrix
        lp = first_order_affine(r, v * (1.0 - jnp.float32(r)),
                                state["lp_z"])
        hp = v - lp
        y = ((1.0 - toan) * lp + toan * hp) * level
        return {"out": y}, {"lp_z": lp[..., -1]}
