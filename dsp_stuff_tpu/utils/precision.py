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


# -- bit-exactness primitives (the 'exact' policy's defense against XLA's
#    value-changing rewrites; rustc contracts nothing by default, so the
#    reference is always separate mul/add/div roundings) ---------------------

def mul_unfused(a, b):
    """f32 multiply that cannot be FMA-contracted with a following add/sub.

    XLA's backends contract ``a*b + c`` into a single-rounding fma at the
    LLVM level (a bare lax.optimization_barrier does not reliably prevent
    it -- barriers may be dropped late, after which the simplifier's
    convert_f32(mul_f64(convert(a), convert(b))) -> mul_f32 rewrite
    re-exposes the contraction), while the Rust reference compiles to
    separate mul and add roundings.  The proven fence: compute the
    product exactly in f64 (53 bits >= 2*24+2, Figueroa), round it onto
    the f32 grid with ``lax.reduce_precision`` -- a semantic op the
    simplifier never removes -- and convert (the single rounding is
    bit-identical to an unfused f32 multiply).

    The TPU X64-rewrite pass has no lowering for f64 reduce-precision
    (parity graphs with fenced ops failed to compile on the real chip),
    so lowering is platform-split: CPU keeps the bit-proven
    reduce_precision fence (where the bitwise oracle tests run); TPU gets
    the f64-product + optimization_barrier form, which compiles and keeps
    the double rounding unless a late pass interferes (the on-chip parity
    budget is -90 dBFS, not bitwise).  Operands are rounded to f32 FIRST
    (a Python float carries f64 precision the reference's f32 math never
    sees)."""
    import jax.numpy as jnp
    if get_policy().sequential_recurrences:
        _warn_exact_on_tpu_once()
    a64 = jnp.asarray(a, jnp.float32).astype(jnp.float64)
    b64 = jnp.asarray(b, jnp.float32).astype(jnp.float64)
    p64 = a64 * b64

    def _rp(p):
        return jax.lax.reduce_precision(p, exponent_bits=8,
                                        mantissa_bits=23)

    p = jax.lax.platform_dependent(p64, cpu=_rp,
                                   default=jax.lax.optimization_barrier)
    return p.astype(jnp.float32)


# l1(taps) ceiling below which bf16x3 GEMMs stay inside the fast-policy
# error contract.  Error model (measured on v5e): a bf16x3 Toeplitz dot
# contributes ~|taps|_1 * |x| * 2e-7 of absolute error -- a fused
# double pole at 0.97 (|g|_1 ~ 5e2) measured -89.0 dBFS vs the oracle
# (CONTRACT BREACH), while benign taps (|g|_1 <= a few) measured
# indistinguishable from HIGHEST (-122.9 dBFS).  16 leaves the HIGH
# contribution <= ~1e-6 (-120 dBFS class) with margin.
GEMM_HIGH_L1_CEILING = 16.0


def gemm_precision(l1: float | None = None):
    """Contraction precision for the BIG signal-sized einsums in the
    blocked recurrence solvers (ops/scan.py, ops/delay_line.py,
    ops/cascade.py): the [T/C, C] @ [C, C] Toeplitz GEMMs and the
    chunk-end mat-vecs whose operands are the whole signal.

    ``l1`` is the solver's tap-matrix row l1 norm (its error
    amplification factor), computed by the caller from its trace-time
    NumPy constants; None means unknown (traced coefficients).

    fast policy on TPU backends with ``l1 <= GEMM_HIGH_L1_CEILING``:
    ``Precision.HIGH`` (bf16x3) — measured 12% cheaper than HIGHEST on
    the main GEMM at batch 512 (10.24 vs 11.61 ms) and, for benign
    taps, error-identical to HIGHEST (-122.9 dBFS over a 10 s a=0.9
    first-order solve: the f32 output rounding dominates).  Resonant
    taps exceed the ceiling and keep HIGHEST — a fused double pole at
    0.97 measured -89.0 dBFS under HIGH, past the -90 contract.
    DST_GEMM_HIGHEST=1 forces HIGHEST everywhere.  NEVER
    Precision.DEFAULT: one-pass bf16 is ~-52 dBFS on v5e.

    The tiny boundary einsums (vec2 carry chains, [C, 2]/[C, 4] constant
    folds on chunk-end vectors) stay HIGHEST unconditionally: their cost
    is negligible and carry errors compound across blocks.

    Read at trace time, like every policy decision."""
    import os
    if (l1 is not None and l1 <= GEMM_HIGH_L1_CEILING
            and get_policy().name == "fast" and tpu_backend()
            and os.environ.get("DST_GEMM_HIGHEST") != "1"):
        return jax.lax.Precision.HIGH
    return jax.lax.Precision.HIGHEST


_warned_exact_tpu = False


def tpu_backend() -> bool:
    """True when the default JAX backend is a TPU — including the axon
    remote-PJRT tunnel.  The single source of truth for every platform
    gate (Mosaic kernel routing, the f64-FFT fallback, the exact-policy
    fence warning): if a backend name is ever added or renamed, this is
    the only line to touch."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _warn_exact_on_tpu_once() -> None:
    """The 'exact' policy's bit-order guarantee is established on the CPU
    backend; on TPU the fence degrades to optimization_barrier (see
    mul_unfused docstring), which a late pass may drop.  Warn once so
    bitwise claims are never silently extended to on-chip runs (on-chip
    the contract is the parity budget, <= -90 dBFS — PARITY.md)."""
    global _warned_exact_tpu
    if _warned_exact_tpu:
        return
    if tpu_backend():
        _warned_exact_tpu = True
        import warnings
        warnings.warn(
            "precision policy 'exact' is tracing for a TPU backend: the "
            "bit-order fence lowers to optimization_barrier there and is "
            "best-effort; bitwise guarantees hold on CPU only (on-chip "
            "contract is the parity policy's -90 dBFS budget)",
            stacklevel=3)


def div_ieee(a, b):
    """f32 division immune to XLA's value-changing divide rewrites.

    Two simplifier rules break bitwise parity with the reference's plain
    f32 divides: ``x / const -> x * (1/const)`` (recip-mul, ~1 ulp) and
    ``(x/b)/c -> x/(b*c)`` (divide-chain fusion -- one rounding fewer, and
    fan-in scalings after every node make divide chains ubiquitous).
    Hiding the divisor behind ``optimization_barrier`` defeats the first
    (non-constant divisor -> LLVM emits a true divide); fencing the result
    with ``reduce_precision`` (f32 identity) defeats the second by hiding
    the inner divide from the outer one's pattern match."""
    import jax.numpy as jnp
    q = jnp.asarray(a, jnp.float32) / jax.lax.optimization_barrier(
        jnp.asarray(b, jnp.float32))
    return jax.lax.reduce_precision(q, exponent_bits=8, mantissa_bits=23)


def exact_mul(a, b):
    """a*b, order-protected (mul_unfused) under the 'exact' policy."""
    if get_policy().sequential_recurrences:
        return mul_unfused(a, b)
    import jax.numpy as jnp
    return jnp.asarray(a, jnp.float32) * jnp.asarray(b, jnp.float32)


def exact_div(a, b):
    """a/b, rewrite-protected (div_ieee) under the 'exact' policy."""
    if get_policy().sequential_recurrences:
        return div_ieee(a, b)
    import jax.numpy as jnp
    return jnp.asarray(a, jnp.float32) / jnp.asarray(b, jnp.float32)
