"""Pallas TPU megakernel for feedback-cycle block programs.

Executes the static program of ops/cycle_segment.py over a sequential
grid: every carried quantity — one-block-delayed member outputs
(REGISTERS [BT, 128] scratch), cascade composite states, comb delay
rings — lives in VMEM across grid steps, so the whole cycle costs one
read of the external feeds + one write of the tapped sequences.  This
replaces the XLA ``lax.scan`` over 128-sample blocks (compile.py
_eval_cycle), whose per-iteration while-loop overhead dominated the
feedback path (config5 measured 1.6% of the HBM roofline).

Kernel conventions shared with ops/pallas_chain.py: BT batch rows per
grid step, TB 128-sample sub-blocks per step (zero-pad time tail on the
last step only), bf16x3 manual splits for l1-gated cascade GEMMs (Mosaic
has no Precision.HIGH), lane-broadcast VPU FMAs for the 8-lane carry
algebra, comb rings as dynamic-slot scratch with pad-block write
suppression, and jax.enable_x64(False) + pallas_math substitutions
around the trace.

The one-block feedback delay falls out of program order: a back edge
reads its register before the writer's ("setreg") runs in the same
sub-block, so it sees the previous block's value — the reference's
emergent task-loop latency (runtime.rs:718-728).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dsp_stuff_tpu.ops.pallas_chain import (C, NS, FUSED_GEMM,
                                            _casc_consts, _pick_tb,
                                            mega_compiler_params, pick_bt,
                                            vmem_limit_for)
from dsp_stuff_tpu.ops.chain_segment import apply_ew


def _build_kernel(program: tuple, TB: int, K: int, K_steps: int,
                  n_e: int, n_c: int, n_b: int, n_r: int, n_t: int):
    """Ref order: [ext x n_e], [per-cascade: ltg, w, ecb, act],
    [per-cascade s0], [per-comb hist], [per-reg prev0], then outs:
    [tap x n_t], [per-cascade: carry_out, xlast_out], [per-comb ring],
    [per-reg final], then scratch: [casc carries], [comb rings],
    [regs]."""
    from dsp_stuff_tpu.utils.precision import gemm_precision
    casc_secs = [ins[1] for ins in program if ins[0] == "cascade"]
    casc_ngp = [(_casc_consts(s)[4], gemm_precision(_casc_consts(s)[5]))
                for s in casc_secs]
    comb_geom = []
    for ins in program:
        if ins[0] == "comb":
            D = ins[2]
            NR = -(-D // C)
            comb_geom.append((NR, NR * C - D, np.float32(ins[1])))
    j_star = (K - 1) % TB

    def kernel(*refs):
        o = 0
        ext_refs = refs[o:o + n_e]; o += n_e
        casc_in = refs[o:o + 4 * n_c]; o += 4 * n_c
        s0_refs = refs[o:o + n_c]; o += n_c
        hist_refs = refs[o:o + n_b]; o += n_b
        prev_refs = refs[o:o + n_r]; o += n_r
        tap_refs = refs[o:o + n_t]; o += n_t
        casc_out = refs[o:o + 2 * n_c]; o += 2 * n_c
        ring_outs = refs[o:o + n_b]; o += n_b
        reg_outs = refs[o:o + n_r]; o += n_r
        carry_refs = refs[o:o + n_c]; o += n_c
        ring_refs = refs[o:o + n_b]; o += n_b
        reg_refs = refs[o:o + n_r]; o += n_r

        k = pl.program_id(1)
        f32 = jnp.float32
        hi = jax.lax.Precision.HIGHEST
        bf16 = jnp.bfloat16

        @pl.when(k == 0)
        def _():
            for c in range(n_c):
                carry_refs[c][:, :] = s0_refs[c][:, :]
            for b in range(n_b):
                NR = comb_geom[b][0]
                for m in range(NR):
                    ring_refs[b][m] = hist_refs[b][:, m * C:(m + 1) * C]
            for r in range(n_r):
                reg_refs[r][:, :] = prev_refs[r][:, :]

        def dot(a, w, prec=hi):
            return jnp.dot(a, w, preferred_element_type=f32,
                           precision=prec)

        def _split(a):
            a_hi = a.astype(bf16)
            return a_hi, (a - a_hi.astype(f32)).astype(bf16)

        def dot_bf3(a, w_hi, w_lo):
            a_hi, a_lo = _split(a)
            cross = dot(a_hi, w_lo, None) + dot(a_lo, w_hi, None)
            return cross + dot(a_hi, w_hi, None)

        casc_split = []
        casc_lw = []
        for ci in range(n_c):
            ltg, w = casc_in[4 * ci], casc_in[4 * ci + 1]
            lw = jnp.concatenate([ltg[:], w[:]], axis=1) if FUSED_GEMM \
                else None
            casc_lw.append(lw)
            if casc_ngp[ci][1] == jax.lax.Precision.HIGH:
                casc_split.append(_split(lw) if FUSED_GEMM
                                  else (_split(ltg[:]), _split(w[:])))
            else:
                casc_split.append(None)

        for j in range(TB):
            def term_val(t, j=j):
                if t[0] == "ext":
                    return ext_refs[t[1]][:, j * C:(j + 1) * C]
                return reg_refs[t[1]][:, :]

            def join(terms, scale):
                acc = term_val(terms[0])
                for t in terms[1:]:
                    acc = acc + term_val(t)
                return acc * f32(scale) if scale != 1.0 else acc

            flow = None
            ci = 0
            bi = 0
            for ins in program:
                op = ins[0]
                if op == "join":
                    flow = join(ins[1], ins[2])
                elif op == "lin2":
                    _, tA, sA, tB_, sB, cA, cB = ins
                    flow = join(tB_, sB) * f32(cB) \
                        + join(tA, sA) * f32(cA)
                elif op == "cascade":
                    ltg, w, ecb, act = casc_in[4 * ci:4 * ci + 4]
                    N, _gp = casc_ngp[ci]
                    if j == j_star:
                        @pl.when(k == K_steps - 1)
                        def _(blk=flow, ci=ci):
                            casc_out[2 * ci][:, :] = jnp.pad(
                                carry_refs[ci][:, :],
                                ((0, 0), (0, C - NS)))
                            casc_out[2 * ci + 1][:, :] = blk
                    carry = carry_refs[ci][:, :]
                    sp = casc_split[ci]
                    if FUSED_GEMM:
                        if sp is not None:
                            yz = dot_bf3(flow, *sp)
                        else:
                            yz = dot(flow, casc_lw[ci])
                        y, newc = yz[:, :C], yz[:, C:]
                    elif sp is not None:
                        (l_hi, l_lo), (w_hi, w_lo) = sp
                        y = dot_bf3(flow, l_hi, l_lo)
                        newc = dot_bf3(flow, w_hi, w_lo)
                    else:
                        y = dot(flow, ltg[:])
                        newc = dot(flow, w[:])
                    for jj in range(N):
                        cj = carry[:, jj:jj + 1]
                        y = y + cj * ecb[jj:jj + 1, :]
                        newc = newc + cj * act[jj:jj + 1, :]
                    carry_refs[ci][:, :] = newc
                    flow = y
                    ci += 1
                elif op == "comb":
                    NR, off, decay = comb_geom[bi]
                    b_idx = k * TB + j
                    slot = jax.lax.rem(b_idx, NR)
                    blkA = ring_refs[bi][slot]
                    if off:
                        slot2 = jax.lax.rem(b_idx + 1, NR)
                        blkB = ring_refs[bi][slot2]
                        delayed = jnp.concatenate(
                            [blkA[:, off:], blkB[:, :off]], axis=1)
                    else:
                        delayed = blkA
                    flow = flow + decay * delayed
                    if j <= j_star:
                        ring_refs[bi][slot] = flow
                    else:
                        @pl.when(k < K_steps - 1)
                        def _(y=flow, bi=bi, slot=slot):
                            ring_refs[bi][slot] = y
                    bi += 1
                elif op == "ew":
                    flow = apply_ew(ins[1], flow, ins[2])
                elif op == "scale":
                    flow = flow * f32(ins[1])
                elif op == "setreg":
                    if j <= j_star:
                        reg_refs[ins[1]][:, :] = flow
                    else:
                        @pl.when(k < K_steps - 1)
                        def _(y=flow, ri=ins[1]):
                            reg_refs[ri][:, :] = y
                elif op == "tap":
                    tap_refs[ins[1]][:, j * C:(j + 1) * C] = flow
                else:
                    raise ValueError(f"unknown cycle instr {op!r}")

        @pl.when(k == K_steps - 1)
        def _():
            for b in range(n_b):
                NR = comb_geom[b][0]
                for m in range(NR):
                    ring_outs[b][:, m, :] = ring_refs[b][m]
            for r in range(n_r):
                reg_outs[r][:, :] = reg_refs[r][:, :]

    return kernel


def cycle_kernel_call(exts: tuple, regs0: tuple, states: tuple,
                      program: tuple, n_taps: int,
                      interpret: bool = False):
    """exts: tuple of [B, T] (T % 128 == 0, >= 1 feed) -> (taps, regs_f,
    per-cascade (carry_last [B, NS], x_last [B, C]), per-comb ring
    [B, NR, C])."""
    from dsp_stuff_tpu.ops.cycle_segment import _program_counts
    f32 = jnp.float32
    exts = tuple(jnp.asarray(e, f32) for e in exts)
    B, T = exts[0].shape
    K = T // C
    TB = _pick_tb(K)
    K_steps = -(-K // TB)
    n_c, n_b, n_r, n_t, n_e = _program_counts(program)
    assert n_e == len(exts) and n_r == len(regs0) and n_t == n_taps
    bt = pick_bt(program, B, n_seq=n_e + n_t, promote=False)
    assert bt is not None, "cycle_kernel_call: rings exceed the VMEM budget"
    Bp = -(-B // bt) * bt
    Tp = K_steps * TB * C

    seq_spec = pl.BlockSpec((bt, TB * C), lambda i, k: (i, k),
                            memory_space=pltpu.VMEM)
    const_spec = lambda shp: pl.BlockSpec(shp, lambda i, k: tuple(
        0 for _ in shp), memory_space=pltpu.VMEM)
    row_spec = lambda shp: pl.BlockSpec(shp, lambda i, k: (i,) + (0,) * (
        len(shp) - 1), memory_space=pltpu.VMEM)

    ops = [jnp.pad(e, ((0, Bp - B), (0, Tp - T))) for e in exts]
    in_specs = [seq_spec] * n_e
    casc_secs = [ins[1] for ins in program if ins[0] == "cascade"]
    for secs in casc_secs:
        Ltg, Wp, Ecb, ACt, _, _ = _casc_consts(secs)
        ops += [jnp.asarray(Ltg), jnp.asarray(Wp), jnp.asarray(Ecb),
                jnp.asarray(ACt)]
        in_specs += [const_spec((C, C)), const_spec((C, NS)),
                     const_spec((NS, C)), const_spec((NS, NS))]
    si = 0
    s0s = []
    hists = []
    for ins in program:
        if ins[0] == "cascade":
            s0 = jnp.asarray(states[si], f32)
            si += 1
            s0s.append(jnp.pad(s0, ((0, Bp - B), (0, NS - s0.shape[-1]))))
        elif ins[0] == "comb":
            hist = jnp.asarray(states[si], f32)
            si += 1
            D = ins[2]
            off = -(-D // C) * C - D
            hists.append(jnp.pad(hist, ((0, Bp - B), (off, 0))))
    for s0p in s0s:
        ops.append(s0p)
        in_specs.append(row_spec((bt, NS)))
    for hp in hists:
        ops.append(hp)
        in_specs.append(row_spec((bt, hp.shape[-1])))
    for r0 in regs0:
        ops.append(jnp.pad(jnp.asarray(r0, f32), ((0, Bp - B), (0, 0))))
        in_specs.append(row_spec((bt, C)))

    out_specs = [seq_spec] * n_t
    out_shape = [jax.ShapeDtypeStruct((Bp, Tp), f32)] * n_t
    for _ in range(n_c):
        for _k in range(2):
            out_specs.append(row_spec((bt, C)))
            out_shape.append(jax.ShapeDtypeStruct((Bp, C), f32))
    scratch = [pltpu.VMEM((bt, NS), f32) for _ in range(n_c)]
    bi = 0
    for ins in program:
        if ins[0] == "comb":
            NR = -(-ins[2] // C)
            out_specs.append(row_spec((bt, NR, C)))
            out_shape.append(jax.ShapeDtypeStruct((Bp, NR, C), f32))
            scratch.append(pltpu.VMEM((NR, bt, C), f32))
            bi += 1
    for _ in range(n_r):
        out_specs.append(row_spec((bt, C)))
        out_shape.append(jax.ShapeDtypeStruct((Bp, C), f32))
        scratch.append(pltpu.VMEM((bt, C), f32))
    # reorder scratch: [casc carries] already first, then rings, then regs
    # (matches kernel unpack order)

    from dsp_stuff_tpu.ops.pallas_math import safe_transcendentals
    kernel = _build_kernel(program, TB, K, K_steps, n_e, n_c, n_b, n_r,
                           n_t)
    with jax.enable_x64(False), safe_transcendentals():
        outs = pl.pallas_call(
            kernel,
            grid=(Bp // bt, K_steps),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=scratch,
            compiler_params=mega_compiler_params(
                vmem_limit_for(program, bt, n_e + n_t, by_estimate=True)),
            interpret=interpret,
        )(*ops)

    o = 0
    taps = tuple(outs[i][:B, :T] for i in range(n_t)); o += n_t
    casc_raw = []
    for c in range(n_c):
        carry = outs[o + 2 * c][:B, :NS]
        x_last = outs[o + 2 * c + 1][:B, :]
        casc_raw.append((carry, x_last))
    o += 2 * n_c
    ring_raw = [outs[o + b][:B] for b in range(n_b)]
    o += n_b
    regs_f = tuple(outs[o + r][:B] for r in range(n_r))
    return taps, regs_f, tuple(casc_raw), tuple(ring_raw)
