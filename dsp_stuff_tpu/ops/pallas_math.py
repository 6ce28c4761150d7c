"""Mosaic-safe f32 transcendentals for Pallas kernel bodies.

The TPU Pallas lowering implements only a subset of elementwise
primitives (exp is native; tanh/atan/sin have no TC lowering rule on
this jaxlib).  The chain megakernel (ops/pallas_chain.py) needs the
shaper transcendentals on VMEM-resident blocks, so these provide them
from native primitives:

  * ``atan``: argument reduction atan(t>1) = pi/2 - atan(1/t) plus a
    Chebyshev-fitted odd polynomial z*P(z^2) on [0, 1] -- max abs error
    1.8e-9 (measured over [0, 1] + reduction), far below f32 rounding;
  * ``tanh``: sign(x)*(1-e)/(1+e) with e = exp(-2|x|) -- ~1-2 ulp from
    a correctly-rounded tanh, |x| clamped upstream by shaping._tanh;
  * ``sin``: Cody-Waite-style reduction mod pi/2 + odd/even minimax
    polynomials, adequate over the shaper range |x*level| <~ 1e3.

These are FAST-policy kernels: the graph-level contract for the fused
fast path is -80..-100 dBFS vs the per-sample oracle (tests/oracle), and
each substitution here is at least ~30 dB below that.  The parity/exact
policies never reach Pallas.

``substituted()`` is the hook ops/shaping.py's ``_trans`` consults: the
megakernel wraps its pallas_call in :func:`safe_transcendentals` so the
SAME shaping functions trace inside the kernel with these bodies.
"""

from __future__ import annotations

import contextlib

import jax.numpy as jnp
import numpy as np

_F32 = jnp.float32

# atan(z) ~ z * P(z^2) on [0, 1]; Chebyshev-node LS fit, max err 1.8e-9
_ATAN_C = (
    9.999999975471e-01, -3.333328230170e-01, 1.999823073982e-01,
    -1.426157440035e-01, 1.094020175826e-01, -8.372070225043e-02,
    5.746364160636e-02, -3.071757376996e-02, 1.068074602243e-02,
    -1.743705505884e-03,
)


def atan(x):
    x = jnp.asarray(x, _F32)
    t = jnp.abs(x)
    inv = t > 1.0
    # reciprocal leg; guard t == 0 (the where discards it)
    z = jnp.where(inv, 1.0 / jnp.maximum(t, _F32(1e-30)), t)
    u = z * z
    p = _F32(_ATAN_C[-1])
    for c in _ATAN_C[-2::-1]:
        p = p * u + _F32(c)
    a = z * p
    a = jnp.where(inv, _F32(np.pi / 2) - a, a)
    return jnp.sign(x) * a


def tanh(x):
    x = jnp.asarray(x, _F32)
    e = jnp.exp(-2.0 * jnp.abs(x))
    return jnp.sign(x) * (1.0 - e) / (1.0 + e)


# sin poly on [-pi/4, pi/4]: s ~ x + x^3*(s1 + s2 x^2 + s3 x^4 + s4 x^6)
_SIN_C = (-1.6666654611e-01, 8.3321608736e-03, -1.9515295891e-04,
          2.718311493e-06)
_COS_C = (4.166664568298827e-02, -1.388731625493765e-03,
          2.443315711809948e-05, -2.605771337e-07)


def sin(x):
    """f32 sine via quadrant reduction; accurate to ~1 ulp * |x|/pi
    (fine for the shaper range; NOT for huge phases)."""
    x = jnp.asarray(x, _F32)
    inv_pio2 = _F32(2.0 / np.pi)
    # round-to-nearest quadrant
    q = jnp.floor(x * inv_pio2 + 0.5)
    # two-step Cody-Waite: pi/2 split into exact high + low parts
    r = x - q * _F32(1.5707855224609375)          # pio2_hi (24-bit exact)
    r = r - q * _F32(1.0804334124e-05)            # pio2_lo
    qi = q.astype(jnp.int32) & 3
    r2 = r * r
    ps = _F32(_SIN_C[-1])
    for c in _SIN_C[-2::-1]:
        ps = ps * r2 + _F32(c)
    sin_r = r + r * r2 * ps
    pc = _F32(_COS_C[-1])
    for c in _COS_C[-2::-1]:
        pc = pc * r2 + _F32(c)
    cos_r = 1.0 - 0.5 * r2 + r2 * r2 * pc
    use_cos = (qi & 1) == 1
    val = jnp.where(use_cos, cos_r, sin_r)
    negate = (qi & 2) == 2
    return jnp.where(negate, -val, val)


_ACTIVE = False


def substituted():
    """True while tracing inside a Pallas kernel body that needs the
    Mosaic-safe transcendental substitutions."""
    return _ACTIVE


@contextlib.contextmanager
def safe_transcendentals():
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = True
    try:
        yield
    finally:
        _ACTIVE = prev


#: jnp function -> Mosaic-safe replacement (consulted by shaping._trans).
#: Probed on v5e (2026-08, jaxlib in this image): tanh/sin/exp/log/sqrt/
#: logistic lower natively AND bit-match the XLA kernels (maxdiff 0.0);
#: atan has no lowering rule at all.  sin substitutes for SPEED, not
#: necessity: the native Mosaic sin measured ~3.9 ms per batch-512 x
#: 10 s pass in the chain megakernel vs ~0.9 ms for the quadrant-
#: reduction polynomial (fetch-corrected; the whole kernel floor is
#: 2.4 ms).  tanh native measured at the DMA floor already — kept
#: native for the bit-match.
SAFE = {"arctan": atan, "sin": sin}
