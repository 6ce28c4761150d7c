"""Fused cascades of adjacent LINEAR nodes (Gain / LowPass / HighPass /
BiQuad).

The reference runs each node as its own task over its own ring
(runtime.rs node tasks); here a maximal run of linear nodes in the
acyclic part of the graph fuses into ONE blocked solve.  Rationale: at
batch 512 each blocked recurrence op is HBM-pass-bound (~1.6x the copy
floor on v5e), so two chained filters cost two full read+GEMM+write
rounds, and even a stateless Gain between einsum consumers costs a
materialized full-signal pass.

Every section is a linear state-space system in the DELAYED-state
convention (state s[t] is the value carried INTO sample t):

    s[t] = A s[t-1] + B u[t-1],      y[t] = C s[t] + D u[t]

    gain(level):  no state,                    D = level
    lp(r):        A = r,  B = 1-r,  C = r,     D = 1-r     (low_pass.rs:36-41)
    hp(r):        A = r,  B = 1-r,  C = -r,    D = r       (high_pass.rs:36-41)
    bq(a, b):     transposed direct form II:                (biquad.rs:79-89)
                  A = [[-a1, 1], [-a2, 0]],
                  B = (b1 - a1 b0, b2 - a2 b0), C = (1, 0), D = b0

Series composition (sys2 consuming h * y1) is exact in this convention:

    A = [[A1, 0], [B2 h C1, A2]],  B = [B1; B2 h D1],
    C = [D2 h C1, C2],             D = D2 h D1

so a whole run collapses to ONE composite (A, B, C, D) with state dim
n = sum of section dims (the compiler caps n <= 2), lowering exactly
like one first-order op: a combined-taps triangular-Toeplitz GEMM
(g[0] = D, g[d] = C A^(d-1) B), one [C_blk, 2] chunk-end mat-vec, and
the tiny vec2 carry chain (ops/scan._vec2_recurrence).  One signal read
+ one write where an unfused k-node run pays up to k of each.

Per-node states survive exactly: one-pole sections read their component
of the composite end state; a biquad's DirectForm1 state rebuilds from
the run input/output histories (x_i = s_pre x[T-i], y_i = y[T-i]/s_post
with s_pre/s_post the scalar gains before/after it — the compiler
refuses runs with a zero post-gain).

Fast-policy only (concrete parameters); the compiler
(compiler/compile.py _plan_linear_fusion) guarantees the preconditions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dsp_stuff_tpu.ops.scan import _BLOCK_C, _vec2_recurrence

#: state dimension per section kind
SECTION_DIMS = {"gain": 0, "lp": 1, "hp": 1, "bq": 2}


def _section_ss(kind: str, p):
    """f64 delayed-state (A [d,d], B [d], C [d], D) for one section."""
    if kind == "gain":
        z = np.zeros((0,), np.float64)
        return np.zeros((0, 0), np.float64), z, z, float(p)
    if kind in ("lp", "hp"):
        r = float(np.float32(p))
        A = np.array([[r]], np.float64)
        B = np.array([1.0 - r], np.float64)
        if kind == "lp":
            return A, B, np.array([r], np.float64), 1.0 - r
        return A, B, np.array([-r], np.float64), r
    if kind == "bq":
        a1, a2, b0, b1, b2 = (float(np.float32(c)) for c in p)
        A = np.array([[-a1, 1.0], [-a2, 0.0]], np.float64)
        B = np.array([b1 - a1 * b0, b2 - a2 * b0], np.float64)
        return A, B, np.array([1.0, 0.0], np.float64), b0
    raise ValueError(f"unknown linear section kind {kind!r}")


def compose_sections(sections):
    """Composite f64 (A, B, C, D) for a series run of sections.

    ``sections`` is a tuple of (kind, param) pairs, in signal order; the
    compiler interleaves the link fan-in scales as ("gain", h) entries.
    """
    A1 = np.zeros((0, 0), np.float64)
    B1 = np.zeros((0,), np.float64)
    C1 = np.zeros((0,), np.float64)
    D1 = 1.0
    for kind, p in sections:
        A2, B2, C2, D2 = _section_ss(kind, p)
        n1, n2 = A1.shape[0], A2.shape[0]
        A = np.zeros((n1 + n2, n1 + n2), np.float64)
        A[:n1, :n1] = A1
        A[n1:, n1:] = A2
        A[n1:, :n1] = np.outer(B2, C1)
        B = np.concatenate([B1, B2 * D1])
        C = np.concatenate([D2 * C1, C2])
        D = D2 * D1
        A1, B1, C1, D1 = A, B, C, D
    return A1, B1, C1, D1


def _embed2(A, B, C):
    """Pad a dim-0/1 composite to the 2-dim carry machinery."""
    n = A.shape[0]
    if n == 2:
        return A, B, C
    A2 = np.zeros((2, 2), np.float64)
    B2 = np.zeros((2,), np.float64)
    C2 = np.zeros((2,), np.float64)
    A2[:n, :n] = A
    B2[:n] = B
    C2[:n] = C
    return A2, B2, C2


@functools.lru_cache(maxsize=128)
def _cascade_constants(sections: tuple, C: int):
    """Trace-time NumPy constants for a fused run (f64 chain, cast once
    to f32 -- same constant-precision contract as the biquad's folded
    impulse response, ops/scan.py _biquad_blocked)."""
    A, B, Cv, D = compose_sections(sections)
    A, B, Cv = _embed2(A, B, Cv)

    P = np.empty((C + 1, 2, 2), np.float64)
    P[0] = np.eye(2)
    for t in range(1, C + 1):
        P[t] = A @ P[t - 1]

    # combined output taps: g[0] = D, g[d] = C A^(d-1) B
    g = np.empty(C, np.float64)
    g[0] = D
    g[1:] = np.einsum("i,dij,j->d", Cv, P[: C - 1], B)
    i = np.arange(C)
    diff = i[None, :] - i[:, None]
    Ltg = np.where(diff >= 0, g[np.clip(diff, 0, C - 1)], 0.0)  # [C, C]

    W = np.einsum("dij,j->di", P[C - 1::-1], B)        # ends taps [C, 2]
    E = np.einsum("i,dij->dj", Cv, P[:C])              # carry->y    [C, 2]

    # bf16x3 eligibility bound for the output GEMM
    # (utils.precision.gemm_precision)
    l1 = float(np.abs(g).sum())

    f32 = np.float32
    return (Ltg.astype(f32), W.astype(f32), E.astype(f32),
            P[C].astype(f32), P.astype(f32), B.astype(f32), l1)


@functools.partial(jax.jit, static_argnums=(1,), inline=True)
def linear_cascade(x, sections: tuple, s_init):
    """Fused run of linear sections over ``x`` [..., T].

    ``s_init`` is the composite delayed state entering sample 0 (shape
    [..., 2]; assemble with :func:`cascade_state_in`).  Returns
    ``(y, s_T)`` where ``s_T`` [..., 2] is the composite state after all
    T samples (decompose with :func:`cascade_state_out`).
    """
    f32 = jnp.float32
    C = _BLOCK_C
    x = jnp.asarray(x, f32)
    T = x.shape[-1]
    batch = x.shape[:-1]

    s_init = jnp.broadcast_to(jnp.asarray(s_init, f32), (*batch, 2))
    Ltg, W, E, AC, P, B, l1 = _cascade_constants(sections, C)
    hi = jax.lax.Precision.HIGHEST
    from dsp_stuff_tpu.utils.precision import gemm_precision
    gp = gemm_precision(l1)

    K = -(-T // C)
    pad = K * C - T
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    X = xp.reshape(*batch, K, C)

    # chunk-end states: one [C, 2] side mat-vec over x (HIGHEST: the
    # mat-vec is bandwidth-bound -- no MXU win from bf16x3 -- and it
    # seeds the carry chain)
    ends = jnp.einsum("...kc,cb->...kb", X, jnp.asarray(W),
                      preferred_element_type=f32, precision=hi)  # [...,K,2]
    ends = ends.at[..., 0, :].add(
        jnp.einsum("ij,...j->...i", jnp.asarray(AC), s_init,
                   preferred_element_type=f32, precision=hi))
    S = _vec2_recurrence(jnp.asarray(AC), ends, M_np=np.asarray(AC))
    carry_in = jnp.concatenate([s_init[..., None, :], S[..., :-1, :]],
                               axis=-2)                          # [..., K, 2]

    # y = combined-taps GEMM + carried-state epilogue (fused by XLA)
    y = jnp.einsum("...kc,cd->...kd", X, jnp.asarray(Ltg),
                   preferred_element_type=f32, precision=gp) \
        + jnp.einsum("...kb,db->...kd", carry_in, jnp.asarray(E),
                     preferred_element_type=f32, precision=hi)
    y = y.reshape(*batch, K * C)[..., :T].astype(f32)

    # composite end state s[T].  The last chunk is zero-padded, so S[K-1]
    # is the state AFTER the pad; instead take one masked [C, 2] mat-vec
    # over the last chunk: s[T] = A^(i+1) s[(K-1)C] + sum_{j<=i} A^(i-j) B x[j]
    i_last = (T - 1) % C
    Wlast = np.zeros((C, 2), np.float64)
    Wlast[: i_last + 1] = np.einsum("dij,j->di", P[i_last::-1], B)
    Wlast = Wlast.astype(np.float32)
    s_zs = jnp.einsum("...c,cb->...b", X[..., K - 1, :],
                      jnp.asarray(Wlast),
                      preferred_element_type=f32, precision=hi)
    s_T = jnp.einsum("ij,...j->...i", jnp.asarray(P[i_last + 1]
                                                  .astype(np.float32)),
                     carry_in[..., K - 1, :],
                     preferred_element_type=f32, precision=hi) + s_zs
    return y, s_T


def run_layout(sections):
    """Per-stateful-section layout of a run: list of
    (section_index, kind, offset, s_pre, s_post) where offset is the
    section's position in the composite state vector and s_pre/s_post
    are the products of scalar D-gains strictly before/after it
    (needed to rebuild a biquad's DirectForm1 state)."""
    out = []
    off = 0
    for idx, (kind, p) in enumerate(sections):
        d = SECTION_DIMS[kind]
        if d:
            pre = 1.0
            for k2, p2 in sections[:idx]:
                pre *= _section_ss(k2, p2)[3] if SECTION_DIMS[k2] == 0 else 1.0
            post = 1.0
            for k2, p2 in sections[idx + 1:]:
                post *= _section_ss(k2, p2)[3] if SECTION_DIMS[k2] == 0 \
                    else 1.0
            out.append((idx, kind, off, pre, post))
            off += d
    return out


def cascade_state_in(sections, node_states):
    """Assemble the composite delayed state [..., 2] from per-node
    states.  ``node_states`` lists, in signal order, one dict per
    STATEFUL section: {"z": ...} for lp/hp, the DirectForm1
    {"x1","x2","y1","y2"} for bq (mapped to transposed-DF2 internals:
    w1 = b1 x1 + b2 x2 - a1 y1 - a2 y2,  w2 = b2 x1 - a2 y1)."""
    f32 = jnp.float32
    comps = []
    si = 0
    for kind, p in sections:
        if SECTION_DIMS[kind] == 0:
            continue
        st = node_states[si]
        si += 1
        if kind in ("lp", "hp"):
            comps.append(jnp.asarray(st["z"], f32))
        else:
            a1, a2, b0, b1, b2 = (np.float32(c) for c in p)
            x1 = jnp.asarray(st["x1"], f32)
            x2 = jnp.asarray(st["x2"], f32)
            y1 = jnp.asarray(st["y1"], f32)
            y2 = jnp.asarray(st["y2"], f32)
            comps.append(b1 * x1 + b2 * x2 - a1 * y1 - a2 * y2)
            comps.append(b2 * x1 - a2 * y1)
    while len(comps) < 2:
        comps.append(jnp.zeros_like(comps[0]) if comps
                     else jnp.asarray(0.0, f32))
    return jnp.stack(jnp.broadcast_arrays(*comps), axis=-1)


def cascade_state_out(sections, s_T, x, y):
    """Decompose the composite end state into per-node state dicts (in
    signal order, one per stateful section).  ``x``/``y`` are the run's
    input/output signals (for the biquad's DirectForm1 histories)."""
    f32 = jnp.float32
    out = []
    for idx, kind, off, pre, post in run_layout(sections):
        if kind in ("lp", "hp"):
            out.append({"z": s_T[..., off]})
        else:
            sp = jnp.float32(pre)
            inv = jnp.float32(1.0 / post)
            out.append({"x1": sp * x[..., -1], "x2": sp * x[..., -2],
                        "y1": inv * y[..., -1], "y2": inv * y[..., -2]})
    return out


def one_pole_pair(x, kind1: str, r1: float, kind2: str, r2: float,
                  h: float, z1, z2):
    """Fused ``sec1 -> (scale h) -> sec2`` one-pole cascade (the
    original pair form, kept as the two-section special case of
    :func:`linear_cascade`).  Returns ``(y, z1_new, z2_new)``."""
    sections = ((kind1, float(r1)), ("gain", float(h)),
                (kind2, float(r2)))
    batch = jnp.asarray(x).shape[:-1]
    z1 = jnp.broadcast_to(jnp.asarray(z1, jnp.float32), batch)
    z2 = jnp.broadcast_to(jnp.asarray(z2, jnp.float32), batch)
    y, s_T = linear_cascade(x, sections, jnp.stack([z1, z2], axis=-1))
    (st1, st2) = cascade_state_out(sections, s_T, x, y)
    return y, st1["z"], st2["z"]
