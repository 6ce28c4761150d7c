"""Global precision policy.

The reference computes in f32 with strictly sequential per-sample loops
(e.g. low_pass.rs:36-41, biquad.rs:87) and accumulates FIR dot products in
f64 (fir.rs:204-216).  Vectorizing those recurrences as associative scans
reassociates floating-point ops, which changes rounding.  The policy decides
how the lowered kernels trade accuracy against speed:

* ``fast``    -- f32 everywhere, associative scans for all linear
                 recurrences.  The TPU throughput mode.
* ``parity``  -- f64 internals for linear-recurrence scans and FIR
                 accumulation; sequential semantics where a recurrence is
                 not associative (envelope follower).  Matches the Rust
                 reference to <= -90 dBFS on supported graphs.
* ``exact``   -- strictly sequential f32 evaluation (lax.scan per sample)
                 for recurrences, bit-matching the reference's operation
                 order wherever XLA's f32 is IEEE (everywhere except
                 transcendental functions).  Slow; for verification only.

The policy is consulted at trace time, so it must be set before
``compile_graph``/``jax.jit`` tracing happens.
"""

from __future__ import annotations

import contextlib
import dataclasses

import jax

# f64 support must be on for parity/exact internals; f32 remains the default
# interchange dtype everywhere.
jax.config.update("jax_enable_x64", True)


@dataclasses.dataclass(frozen=True)
class PrecisionPolicy:
    name: str
    # dtype used inside linear-recurrence associative scans
    scan_internal_dtype: str = "float32"
    # dtype used for FIR / convolution accumulation (reference uses f64,
    # fir.rs:204-216)
    fir_accum_dtype: str = "float64"
    # evaluate recurrences strictly sequentially (bit-order parity)
    sequential_recurrences: bool = False


FAST = PrecisionPolicy("fast", scan_internal_dtype="float32",
                       fir_accum_dtype="float32",
                       sequential_recurrences=False)
PARITY = PrecisionPolicy("parity", scan_internal_dtype="float64",
                         fir_accum_dtype="float64",
                         sequential_recurrences=False)
EXACT = PrecisionPolicy("exact", scan_internal_dtype="float32",
                        fir_accum_dtype="float64",
                        sequential_recurrences=True)

_POLICIES = {p.name: p for p in (FAST, PARITY, EXACT)}

_current = PARITY


def get_policy() -> PrecisionPolicy:
    return _current


def set_policy(p: str | PrecisionPolicy) -> PrecisionPolicy:
    global _current
    if isinstance(p, str):
        p = _POLICIES[p]
    _current = p
    return p


@contextlib.contextmanager
def policy(p: str | PrecisionPolicy):
    prev = get_policy()
    set_policy(p)
    try:
        yield get_policy()
    finally:
        set_policy(prev)
