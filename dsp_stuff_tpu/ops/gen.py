"""Signal generator oscillators (signal_gen.rs semantics).

The reference integrates a per-sample phase step ``f[i]/48000`` into a
running ``total`` within each 128-sample block, on top of a persistent
``clock`` phase that wraps mod 1.0 across blocks (signal_gen.rs:57-103):

    sine:     sin((clock + total_i) * tau) * amp_i     (signal_gen.rs:57-71)
    triangle: (2*((clock + total_i) % 1) - 1) * amp_i  (signal_gen.rs:73-87)
    square:   (total_i > 0.5 ? 1 : -1) * amp_i         (signal_gen.rs:89-103)
    constant: amp_i                                     (signal_gen.rs:106-108)

The square wave compares only the *intra-block* total (ignoring ``clock``) --
a reference bug that makes square output wrong below ~187.5 Hz at block 128
(SURVEY.md 2.4 #4).  Kept for parity: phase accumulation here is reset per
128-sample block exactly like the reference, including the per-block
``clock = (clock + total) % 1`` wrap in f32.

Lowering: the in-block f32 running sum is computed as a cumulative sum per
block (f64 accumulate then rounded -- correctly-rounded totals, which agree
with the reference's f32 running sum to well below -90 dBFS for audio-band
frequencies; the 'exact' policy uses a sequential f32 scan instead).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dsp_stuff_tpu.utils.precision import get_policy

TAU = np.float32(2.0 * np.pi)


def _block_totals(freq, T, block_size, sample_rate, clock0):
    """Per-sample in-block running total and per-block carry-in clock.

    freq: scalar or [..., T].  Returns (totals [..., T], clock [..., T],
    final_clock), where totals resets at each block boundary and clock is
    the persistent phase at each sample's block start (wrapped mod 1 each
    block, f32, seeded with clock0).

    The in-block running sum is evaluated as a true sequential f32 scan —
    bit-identical to the reference's ``total += step`` loop — but over the
    *sample-within-block* axis with all blocks vectorized, so it costs only
    ``block_size`` sequential steps regardless of T.  Bit-exactness here is
    not a luxury: a 1-ulp phase difference at a mod-1 wrap flips the
    triangle output by full scale, so correctly-rounded (f64) totals do NOT
    meet the -90 dBFS parity bar.
    """
    f32 = jnp.float32
    assert T % block_size == 0, (T, block_size)
    nb = T // block_size
    step = jnp.broadcast_to(jnp.asarray(freq, f32) / f32(sample_rate), (T,)) \
        if jnp.ndim(freq) == 0 else jnp.asarray(freq, f32) / f32(sample_rate)
    step = jnp.broadcast_to(step, step.shape[:-1] + (T,))
    batch = step.shape[:-1]
    sb = step.reshape(*batch, nb, block_size)

    def inner(carry, s):                    # s: [..., nb]
        tot = carry + s
        return tot, tot

    _, tots = jax.lax.scan(inner, jnp.zeros((*batch, nb), f32),
                           jnp.moveaxis(sb, -1, 0))
    totals = jnp.moveaxis(tots, 0, -1)                            # [..., nb, B]

    block_sum = totals[..., -1]                                   # [..., nb]

    # clock carried across blocks, seeded with clock0:
    # c[k] = (c[k-1] + block_sum[k-1]) % 1 in f32 (signal_gen.rs:66-70)
    c0 = jnp.broadcast_to(jnp.asarray(clock0, f32), batch)
    if get_policy().name == "fast":
        # The per-block mod makes the chain non-associative in f32, but
        # mathematically c[k] = (c0 + sum(bs[:k])) % 1; an f64 cumsum is
        # exact to ~2^-40 over hours of audio, so one vectorized pass
        # replaces a T/128-step sequential scan (22.5k steps per minute).
        csum = jnp.cumsum(block_sum.astype(jnp.float64), axis=-1)
        shifted = jnp.concatenate(
            [jnp.zeros((*batch, 1), jnp.float64), csum], axis=-1)
        cl = jnp.mod(c0[..., None].astype(jnp.float64) + shifted, 1.0)
        clocks = cl[..., :-1].astype(f32)                         # [..., nb]
        final_clock = cl[..., -1].astype(f32)
    else:
        def carry_step(c, bs):
            nc = jnp.mod(c + bs, 1.0)
            return nc, c

        final_clock, clocks = jax.lax.scan(
            carry_step, c0, jnp.moveaxis(block_sum, -1, 0))
        clocks = jnp.moveaxis(clocks, 0, -1)                      # [..., nb]
    return (totals.reshape(*batch, T),
            jnp.repeat(clocks, block_size, axis=-1),
            final_clock)


def oscillator(mode: str, amplitude, frequency, T: int,
               clock0=0.0, block_size: int = 128, sample_rate: int = 48_000):
    """Render T samples. amplitude/frequency scalar or [..., T] (modulated).
    Returns (y [..., T] f32, final_clock)."""
    f32 = jnp.float32
    amp = jnp.asarray(amplitude, f32)
    if mode == "Constant":
        # do_const copies the (possibly modulated) amplitude buffer verbatim
        # (signal_gen.rs:106-108)
        return amp * jnp.ones((T,), f32), jnp.asarray(clock0, f32)

    totals, clocks, final_clock = _block_totals(frequency, T, block_size,
                                                sample_rate, clock0)
    # exact_mul: the trailing *amp must not FMA-contract into a consumer's
    # fan-in add under the 'exact' policy (order-protected at the producer)
    from dsp_stuff_tpu.utils.precision import exact_mul
    phase = clocks + totals
    if mode == "Sine":
        # sin precision by policy (the oracle's <=1-ulp convention, like
        # the chorus LFO): a native f32 sin differs from the f64-rounded
        # value by ~1 ulp, which a downstream modulation target with high
        # phase sensitivity (a chorus rate port) amplifies past the -90
        # parity budget.  fast keeps the cheap f32 sin.
        from dsp_stuff_tpu.utils.precision import get_policy, mul_unfused
        arg = phase * TAU
        if get_policy().name == "fast":
            y = exact_mul(jnp.sin(arg), amp)
        else:
            # Range-reduce BEFORE the f64 sin: on the real chip f64 is
            # emulated and its transcendental tails are broken for large
            # arguments (CLAUDE.md; phase*TAU reaches ~340 at the 20 kHz
            # slider max).  The exact f64 reduction changes the result by
            # ~1e-13, far below the f32 rounding of the returned value.
            # mul_unfused, not a bare mul: the simplifier would sink the
            # f32 convert through it (convert(sin64)*amp ->
            # convert(sin64*amp), one rounding instead of two) -- a 1-ulp
            # LFO shift that chorus-rate modulation amplifies ~900x (same
            # rewrite as the chorus trajectory, ops/modfx.py)
            a64 = arg.astype(jnp.float64)
            a64 = a64 - (2.0 * np.pi) * jnp.round(a64 / (2.0 * np.pi))
            s = jnp.sin(a64).astype(f32)
            y = mul_unfused(s, amp)
    elif mode == "Triangle":
        y = exact_mul(2.0 * jnp.mod(phase, 1.0) - 1.0, amp)
    elif mode == "Square":
        # reference bug kept: compares intra-block total only
        y = exact_mul(jnp.where(totals > 0.5, f32(1.0), f32(-1.0)), amp)
    else:
        raise ValueError(mode)
    return y, final_clock
