"""Fused cascade of two adjacent one-pole filter nodes (LowPass/HighPass).

The reference runs each filter node as its own task over its own ring
(runtime.rs node tasks); here adjacent one-pole nodes in the acyclic part
of the graph fuse into ONE blocked solve.  Rationale: at batch 512 each
blocked first-order op is HBM-pass-bound (~1.6x the copy floor on v5e),
so two chained filters cost two full read+GEMM+write rounds.  The pair

    sec1 -> (fan-in scale h) -> sec2        sec_i in {low_pass, high_pass}

is a single 2-dim linear state recurrence

    s[t] = A s[t-1] + c x[t],   y[t] = p . s[t] + q x[t]
    s = (u1, u2)  -- the two nodes' one-pole states z (filters.py)

with constant A/c/p/q, so the whole pair lowers exactly like one
first-order op: a combined-taps triangular-Toeplitz GEMM (g[d] = p A^d c,
g[0] += q), one [C, 2] chunk-end mat-vec, and the tiny vec2 carry chain
(ops/scan._vec2_recurrence).  One signal read + one write where the
unfused pair pays two of each.

Semantics per section (low_pass.rs:36-41 / high_pass.rs:36-41):
    lp: u[t] = r u[t-1] + (1-r) v[t],  out = u
    hp: same u,                        out = v - u
``h`` is the link fan-in scale the compiler applies between the nodes
(compiler/compile.py _avg); it folds into the tap constants.

Fast-policy only (concrete ratios); the compiler (compiler/compile.py
_plan_one_pole_fusion) guarantees the preconditions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dsp_stuff_tpu.ops.scan import _BLOCK_C, _vec2_recurrence


def _section_io(kind: str):
    """(e, d): section output = e * u + d * v for input v."""
    if kind == "lp":
        return 1.0, 0.0
    if kind == "hp":
        return -1.0, 1.0
    raise ValueError(f"unknown one-pole section kind {kind!r}")


@functools.lru_cache(maxsize=64)
def _pair_constants(kind1: str, r1: float, kind2: str, r2: float,
                    h: float, C: int):
    """Trace-time NumPy constants for the fused pair (f64 chain, cast
    once to f32 -- same constant-precision contract as the biquad's
    folded impulse response, ops/scan.py _biquad_blocked)."""
    e1, d1 = _section_io(kind1)
    e2, d2 = _section_io(kind2)
    r1 = float(np.float32(r1))
    r2 = float(np.float32(r2))
    A = np.array([[r1, 0.0],
                  [(1.0 - r2) * h * e1 * r1, r2]], np.float64)
    c = np.array([1.0 - r1,
                  (1.0 - r2) * h * (e1 * (1.0 - r1) + d1)], np.float64)
    p = np.array([d2 * h * e1, e2], np.float64)
    q = d2 * h * d1

    P = np.empty((C + 1, 2, 2), np.float64)
    P[0] = np.eye(2)
    for t in range(1, C + 1):
        P[t] = A @ P[t - 1]

    # combined output taps g[d] = p . A^d c (+ q at d = 0)
    g = np.einsum("i,dij,j->d", p, P[:C], c)
    g[0] += q
    i = np.arange(C)
    diff = i[None, :] - i[:, None]
    Ltg = np.where(diff >= 0, g[np.clip(diff, 0, C - 1)], 0.0)  # [C, C]

    W = np.einsum("dij,j->di", P[C - 1::-1], c)        # ends taps [C, 2]
    E = np.einsum("i,dij->dj", p, P[1:])               # carry->y    [C, 2]
    r1pows = np.concatenate([[1.0], np.cumprod(np.full(C, r1))])

    f32 = np.float32
    return (Ltg.astype(f32), W.astype(f32), E.astype(f32),
            P[C].astype(f32), P.astype(f32), r1pows.astype(f32),
            (e1, d1, e2, d2))


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5), inline=True)
def one_pole_pair(x, kind1: str, r1: float, kind2: str, r2: float,
                  h: float, z1, z2):
    """Fused ``sec1 -> (scale h) -> sec2`` one-pole cascade.

    ``x`` [..., T] is sec1's (already fan-in-averaged) input; ``z1``/``z2``
    broadcast to x[..., 0] and are the nodes' carried one-pole states.
    Returns ``(y, z1_new, z2_new)`` with y = sec2's output and z_i_new =
    u_i[T-1] -- bit-comparable (same -84 dBFS fast-policy class, see
    tests) to running the two nodes unfused.
    """
    f32 = jnp.float32
    C = _BLOCK_C
    x = jnp.asarray(x, f32)
    T = x.shape[-1]
    batch = x.shape[:-1]
    z1 = jnp.broadcast_to(jnp.asarray(z1, f32), batch)
    z2 = jnp.broadcast_to(jnp.asarray(z2, f32), batch)

    Ltg, W, E, AC, P, r1pows, (e1, d1, e2, d2) = _pair_constants(
        kind1, float(r1), kind2, float(r2), float(h), C)
    hi = jax.lax.Precision.HIGHEST

    K = -(-T // C)
    pad = K * C - T
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    X = xp.reshape(*batch, K, C)

    # chunk-end zero-state 2-vectors, one [C, 2] side mat-vec over x
    ends = jnp.einsum("...kc,cb->...kb", X, jnp.asarray(W),
                      preferred_element_type=f32, precision=hi)  # [...,K,2]
    s_init = jnp.stack([z1, z2], axis=-1)                        # [..., 2]
    ends = ends.at[..., 0, :].add(
        jnp.einsum("ij,...j->...i", jnp.asarray(AC), s_init,
                   preferred_element_type=f32, precision=hi))
    S = _vec2_recurrence(jnp.asarray(AC), ends, M_np=np.asarray(AC))
    carry_in = jnp.concatenate([s_init[..., None, :], S[..., :-1, :]],
                               axis=-2)                          # [..., K, 2]

    # y = combined-taps GEMM + carried-state epilogue (fused by XLA)
    y = jnp.einsum("...kc,cd->...kd", X, jnp.asarray(Ltg),
                   preferred_element_type=f32, precision=hi) \
        + jnp.einsum("...kb,db->...kd", carry_in, jnp.asarray(E),
                     preferred_element_type=f32, precision=hi)
    y = y.reshape(*batch, K * C)[..., :T].astype(f32)

    # final one-pole states.  The last chunk is zero-padded, so S[K-1] is
    # the state AFTER the pad, not at T-1: recover u1[T-1] from the
    # (decoupled, scalar) first row -- one C-tap mat-vec on the last
    # chunk only -- then invert y = e2 u2 + d2 v2 for u2[T-1].
    i_last = (T - 1) % C
    j = np.arange(C)
    t1 = np.where(j <= i_last,
                  r1pows[np.clip(i_last - j, 0, C)]
                  * np.float32(1.0 - np.float32(r1)), 0.0).astype(np.float32)
    u1_zs = jnp.einsum("...c,c->...", X[..., K - 1, :], jnp.asarray(t1),
                       preferred_element_type=f32, precision=hi)
    u1_last = r1pows[i_last + 1] * carry_in[..., K - 1, 0] + u1_zs
    v2_last = jnp.float32(h) * (jnp.float32(e1) * u1_last
                                + jnp.float32(d1) * x[..., T - 1])
    u2_last = (y[..., T - 1] - jnp.float32(d2) * v2_last) * jnp.float32(e2)
    return y, u1_last, u2_last
