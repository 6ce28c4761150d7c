"""Pallas TPU megakernel: a whole chain segment in ONE HBM pass.

The XLA composition of a 10-node chain pays one full signal read+write
per stage (plus extra operand passes inside each blocked solve) -- at
batch 512 the chain measured ~9% of the pure-I/O HBM floor.  On TPU,
Pallas grids execute sequentially, so every per-stage carry (cascade
composite states, comb delay rings) can live in VMEM scratch across grid
steps and a [BT, 128] block flows through ALL stages while resident:

  per grid step ([BT, TB*128] samples in VMEM), per 128-sample sub-block:
    cascade:  Z = X Ltg (MXU) ; y = Z + s Ecb ; s = s ACt + X W
    scale/ew: VPU elementwise on the resident block (ops/shaping fns
              trace inside the kernel unchanged)
    comb:     delayed = ring[slot(b-NR)] (+ static intra-block shift);
              y = x + d*delayed ; ring[slot(b)] = y

The whole segment costs one signal read + one write; everything else
(tap matrices, carries, rings) stays on-chip.  Measured at batch 512 x
10 s on v5e (fetch-corrected): the kernel's DMA floor is ~2.4 ms — the
pure in+out HBM speed of light — with cascades +3.9 ms (two bf16x3 MXU
GEMMs per 128-block; the carry algebra rides the VPU), shapers +1.5 ms
and the comb +0.9 ms hiding mostly under the DMA.  State handoff for the
compiler's per-node rebuild: at the last REAL block each cascade stage
emits (carry entering it, its input block) and each comb emits its ring
(ops/chain_segment.py reconstructs s_tm1/s_tm2 and the [D] history).

Stage grammar and dispatch preconditions: ops/chain_segment.py.
Mosaic gotchas honored (CLAUDE.md): trace under jax.enable_x64(False);
no scatter (ring updates are leading-dim dynamic-slice stores); where-
selects over masked multiplies come from the shaping fns themselves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dsp_stuff_tpu.ops.cascade import _cascade_constants
from dsp_stuff_tpu.ops.chain_segment import apply_ew

import os

BT = int(os.environ.get("DST_MEGA_BT", "128"))   # batch rows per grid step
C = 128        # samples per sub-block (the compiler's reference frame)
NS = 8         # padded composite-state lanes (MAX_RUN_DIM embeds <= 8)
_TB_CAP = int(os.environ.get("DST_MEGA_TB", "16"))
#: merge each cascade's two signal GEMMs (y = blk@Ltg [C,C] and
#: newc = blk@W [C,NS]) into ONE blk@[Ltg|W] [C,C+NS] dot per sub-block
#: (identical math per column — concatenation doesn't change any dot's
#: reduction); opt-in measurement flag (tools/measure_mega.py)
FUSED_GEMM = os.environ.get("DST_MEGA_FUSED_GEMM", "0") == "1"


def mega_compiler_params(vmem_limit: int | None = None):
    """Mosaic compiler params for both megakernels.

    ``vmem_limit`` is the geometry-computed scoped-VMEM limit from
    vmem_limit_for (None = Mosaic's 16 MiB default).  Env overrides for
    the measurement harnesses (read at call time, set per subprocess):

    - DST_MEGA_VMEM_MB: force the scoped-VMEM limit (physical VMEM on
      v5e is 128 MiB) — the BT=256 geometry and the two-register cycle
      program at a direct B=512 call both exceed the 16 MiB default by
      small margins.
    - DST_MEGA_DIMSEM=parallel: declare the batch grid dim PARALLEL
      (iterations over batch groups are independent; time stays
      ARBITRARY for the carried scratch).  Measured a wash at the bench
      chain (484,394 vs 492,388 baseline) — kept for measurement only.
    """
    kw = {}
    mb = os.environ.get("DST_MEGA_VMEM_MB")
    if mb:
        kw["vmem_limit_bytes"] = int(mb) * 1024 * 1024
    elif vmem_limit is not None:
        kw["vmem_limit_bytes"] = int(vmem_limit)
    if os.environ.get("DST_MEGA_DIMSEM") == "parallel":
        kw["dimension_semantics"] = (
            pltpu.GridDimensionSemantics.PARALLEL,
            pltpu.GridDimensionSemantics.ARBITRARY)
    return pltpu.CompilerParams(**kw) if kw else None


def _pick_tb(K: int, cap: int | None = None) -> int:
    """Sub-blocks per grid step: the largest divisor of K <= the cap
    (zero time padding), or the cap when K is divisor-poor (pad < TB
    blocks).  The promoted BT=256 chain tile passes cap=8: TB=8 keeps
    the doubled sequential tiles at the same VMEM footprint and
    measured best there (520,423 vs 514,311 audio-s/s at TB=16)."""
    cap = _TB_CAP if cap is None else min(cap, _TB_CAP)
    for tb in range(cap, 0, -1):
        if K % tb == 0:
            return tb
    return cap


def _ring_bytes(stages, bt: int) -> int:
    """VMEM bytes of the delay-ring scratch (comb output rings + mtap
    input rings) at ``bt`` batch rows per grid step."""
    rb = 0
    for st in stages:
        if st[0] == "comb":
            rb += -(-st[2] // C) * C * bt * 4
        elif st[0] == "mtap":
            rb += (st[3] + 1) * C * bt * 4
    return rb


#: total scoped-VMEM the kernels may request via a computed
#: vmem_limit_bytes (physical VMEM on v5e is 128 MiB); beyond this the
#: batch tile halves, and past bt=32 the fallback composition runs
_VMEM_CAP_BYTES = int(os.environ.get("DST_MEGA_VMEM_CAP_MB", "96")) * 2**20
_MOSAIC_DEFAULT_VMEM = 16 * 2**20       # Mosaic's scoped-vmem default
_LEGACY_RING_BYTES = 6 * 2**20          # the pre-r5 ring budget


def _vmem_need_bytes(stages, bt: int, n_seq: int, tb: int = None) -> int:
    """Estimated scoped-VMEM demand: ring scratch + the ring-sized
    history row inputs (~another ring), double-buffered sequential
    tiles (input + output + taps), + an 8 MiB margin for constants,
    carries and the Mosaic stack.  Validated against the compiler's own
    accounting: the two-register cycle program it reports at 16.08 MiB
    estimates at ~19 MiB here."""
    tb = _TB_CAP if tb is None else tb
    tiles = 2 * n_seq * bt * tb * C * 4
    return 2 * _ring_bytes(stages, bt) + tiles + 8 * 2**20


def pick_bt(stages, B: int | None = None,
            n_seq: int | None = None, promote: bool = True) -> int | None:
    """Batch rows per grid step for a stage list.

    Candidates: 256 first when the batch is a whole multiple of 256 and
    no explicit DST_MEGA_BT is set (measured at the bench chain,
    batch 512 x 10 s: BT=256 with a raised scoped-VMEM limit + TB=8
    beats BT=128 492,388 -> 520,423 audio-s/s — the r4 'BT=256 dead
    end' was only the 16 MiB default limit); then the configured BT,
    halving (min 32) until the estimated VMEM need fits the 96 MiB cap.
    Long combs that fit the cap keep the full tile and get a computed
    vmem_limit_bytes instead of halving (see vmem_limit_for).
    None: nothing fits (the fallback composition runs).

    ``promote=False`` (the cycle kernel): skip the 256 promotion — the
    cycle grid round-trips its register tuple per step, and BT=256
    measured a 18% REGRESSION there (config5_shape B=512: 616,708 vs
    756,181 audio-s/s)."""
    if n_seq is None:
        n_seq = 2 + sum(1 for st in stages if st[0] == "tap")
    cands = []
    if (promote and B is not None and B >= 256 and B % 256 == 0
            and BT == 128):
        cands.append(256)
    bt = BT
    while bt >= 32:
        cands.append(bt)
        bt //= 2
    for bt in cands:
        if _vmem_need_bytes(stages, bt, n_seq) <= _VMEM_CAP_BYTES:
            return bt
    return None


def vmem_limit_for(stages, bt: int, n_seq: int,
                   by_estimate: bool = False) -> int | None:
    """Computed vmem_limit_bytes for a picked geometry — None (Mosaic
    default) exactly when the legacy gate would have accepted this tile
    (bt <= 128 and rings within the old 6 MiB budget), so every
    measured default path compiles bit-identically; a raised limit only
    for the promoted BT=256 tile and for ring sets past the old budget
    (which used to halve the tile or lose the fusion).

    ``by_estimate``: decide by the need estimate instead of the legacy
    ring gate — for the cycle kernel, whose register tuple + history
    rows can exceed the 16 MiB default with rings well under 6 MiB (the
    two-register config5_shape program needs 16.08 MiB)."""
    if by_estimate:
        if bt <= 128 and (_vmem_need_bytes(stages, bt, n_seq)
                          <= _MOSAIC_DEFAULT_VMEM - 2 * 2**20):
            return None
    elif bt <= 128 and _ring_bytes(stages, bt) <= _LEGACY_RING_BYTES:
        return None
    need = _vmem_need_bytes(stages, bt, n_seq)
    return min(max(need, _MOSAIC_DEFAULT_VMEM), _VMEM_CAP_BYTES)


@functools.lru_cache(maxsize=64)
def _casc_consts(sections: tuple):
    """(Ltg [C,C], W [C,NS], Ecb [NS,C], ACt [NS,NS], N, l1) f32 NumPy
    for one cascade stage, padded to the NS-lane carry layout.  N is the
    embedded carry dim (rows >= N of Ecb/ACt are zero — the kernel's VPU
    carry loops run over N only); l1 is the Ltg row-l1 for the
    gemm_precision gate."""
    Ltg, W, E, P, N, B, l1, _ = _cascade_constants(sections, C, ())
    Wp = np.zeros((C, NS), np.float32)
    Wp[:, :N] = W
    Ecb = np.zeros((NS, C), np.float32)
    Ecb[:N, :] = E.T
    ACt = np.zeros((NS, NS), np.float32)
    ACt[:N, :N] = P[C].astype(np.float32).T
    return Ltg, Wp, Ecb, ACt, N, l1


def _build_kernel(stages: tuple, TB: int, K: int, K_steps: int):
    """Kernel closure for a static stage list.

    Ref order: x, [per-cascade: ltg, w, ecb, act, s0], [per-comb: hist],
    [per-mtap: hist, q(SMEM), r, frac], then outs: y, [tap x n_t],
    [per-cascade: carry_out, xlast_out], [per-comb: ring_out],
    [per-mtap: ring_out], then scratch: [per-cascade: carry],
    [per-comb: ring], [per-mtap: ring]."""
    from dsp_stuff_tpu.utils.precision import gemm_precision
    cascades = [st for st in stages if st[0] == "cascade"]
    combs = [st for st in stages if st[0] == "comb"]
    mtaps = [st for st in stages if st[0] == "mtap"]
    n_c = len(cascades)
    n_b = len(combs)
    n_m = len(mtaps)
    n_t = sum(1 for st in stages if st[0] == "tap")
    # per-cascade (embedded carry dim, l1-gated Ltg GEMM precision) —
    # trace-time, same gate as linear_cascade's main taps GEMM
    casc_ngp = [( _casc_consts(st[1])[4], gemm_precision(_casc_consts(st[1])[5]) )
                for st in cascades]
    j_star = (K - 1) % TB
    comb_geom = []
    for st in combs:
        D = st[2]
        NR = -(-D // C)
        comb_geom.append((NR, NR * C - D, np.float32(st[1])))

    def kernel(*refs):
        x_ref = refs[0]
        casc_in = refs[1:1 + 4 * n_c]
        s0_refs = refs[1 + 4 * n_c:1 + 5 * n_c]
        hist_refs = refs[1 + 5 * n_c:1 + 5 * n_c + n_b]
        o = 1 + 5 * n_c + n_b
        mtap_in = refs[o:o + 4 * n_m]          # hist, q, r, frac per mtap
        o += 4 * n_m
        y_ref = refs[o]
        tap_refs = refs[o + 1:o + 1 + n_t]
        o = o + 1 + n_t
        casc_out = refs[o:o + 2 * n_c]
        ring_outs = refs[o + 2 * n_c:o + 2 * n_c + n_b]
        mring_outs = refs[o + 2 * n_c + n_b:o + 2 * n_c + n_b + n_m]
        s = o + 2 * n_c + n_b + n_m
        carry_refs = refs[s:s + n_c]
        ring_refs = refs[s + n_c:s + n_c + n_b]
        mring_refs = refs[s + n_c + n_b:s + n_c + n_b + n_m]

        k = pl.program_id(1)
        f32 = jnp.float32
        hi = jax.lax.Precision.HIGHEST

        @pl.when(k == 0)
        def _():
            for c in range(n_c):
                carry_refs[c][:, :] = s0_refs[c][:, :]
            for b in range(n_b):
                NR = comb_geom[b][0]
                for m in range(NR):
                    ring_refs[b][m] = hist_refs[b][:, m * C:(m + 1) * C]
            for mi, st in enumerate(mtaps):
                NH = st[3]
                hm = mtap_in[4 * mi]
                # hist block m is signal block m - NH -> slot m + 1
                # (mod NRW = NH + 1); slot 0 belongs to block 0
                for m in range(NH):
                    mring_refs[mi][m + 1] = hm[:, m * C:(m + 1) * C]

        def dot(a, w, prec=hi):
            return jnp.dot(a, w, preferred_element_type=f32, precision=prec)

        bf16 = jnp.bfloat16

        def _split(a):
            a_hi = a.astype(bf16)
            return a_hi, (a - a_hi.astype(f32)).astype(bf16)

        def dot_bf3(a, w_hi, w_lo):
            """bf16x3 f32 matmul (what Precision.HIGH lowers to in XLA;
            Mosaic has no HIGH lowering rule, so spelled out): three
            native-bf16 MXU passes over the hi/lo mantissa splits, the
            cross terms accumulated first."""
            a_hi, a_lo = _split(a)
            cross = dot(a_hi, w_lo, None) + dot(a_lo, w_hi, None)
            return cross + dot(a_hi, w_hi, None)

        # hoist the constant-operand bf16 splits of the HIGH-gated
        # cascade GEMMs out of the sub-block loop (once per grid step);
        # under FUSED_GEMM the two constants concatenate into one
        # [C, C+NS] operand here (one VMEM copy per grid step)
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
            blk = x_ref[:, j * C:(j + 1) * C]
            ci = 0
            bi = 0
            mi = 0
            for st in stages:
                if st[0] == "cascade":
                    ltg, w, ecb, act = casc_in[4 * ci:4 * ci + 4]
                    N, gp = casc_ngp[ci]
                    if j == j_star:
                        @pl.when(k == K_steps - 1)
                        def _(blk=blk, ci=ci):
                            # carry ENTERING the last real block + that
                            # block's stage input, for the host-side
                            # s_tm1/s_tm2 rebuild
                            casc_out[2 * ci][:, :] = jnp.pad(
                                carry_refs[ci][:, :],
                                ((0, 0), (0, C - NS)))
                            casc_out[2 * ci + 1][:, :] = blk
                    carry = carry_refs[ci][:, :]
                    # y = blk@Ltg + carry@Ecb; carry' = blk@W + carry@ACt.
                    # The carry terms run as N lane-broadcast VPU FMAs —
                    # true f32, strictly tighter than an MXU bf16-pass
                    # matmul, and they skip the 8-lane tile padding that
                    # wastes 15/16 of the MXU (measured: the original 4
                    # HIGHEST MXU ops/block were 13.1 of the ~20 ms
                    # fetch-corrected render, now 3.9).  The two blk
                    # GEMMs run bf16x3 when the
                    # stage's tap l1 passes the gemm_precision gate
                    # (benign taps measured error-identical, CLAUDE.md),
                    # HIGHEST otherwise.
                    sp = casc_split[ci]
                    if FUSED_GEMM:
                        if sp is not None:
                            yz = dot_bf3(blk, *sp)
                        else:
                            yz = dot(blk, casc_lw[ci])
                        y, newc = yz[:, :C], yz[:, C:]
                    elif sp is not None:
                        (l_hi, l_lo), (w_hi, w_lo) = sp
                        y = dot_bf3(blk, l_hi, l_lo)
                        newc = dot_bf3(blk, w_hi, w_lo)
                    else:
                        y = dot(blk, ltg[:])
                        newc = dot(blk, w[:])
                    for jj in range(N):
                        cj = carry[:, jj:jj + 1]
                        y = y + cj * ecb[jj:jj + 1, :]
                        newc = newc + cj * act[jj:jj + 1, :]
                    carry_refs[ci][:, :] = newc
                    blk = y
                    ci += 1
                elif st[0] == "scale":
                    blk = blk * f32(st[1])
                elif st[0] == "ew":
                    blk = apply_ew(st[1], blk, st[2])
                elif st[0] == "tap":
                    tap_refs[st[1]][:, j * C:(j + 1) * C] = blk
                elif st[0] == "mtap":
                    # modulated fractional tap (chorus) on a VMEM ring
                    # of the stage INPUT.  The shared trajectory comes
                    # precomputed (modfx.mtap_shared): per-block
                    # window start q (SMEM scalar), residual
                    # one-hot selector r < EV, interp weight frac.
                    _, mix, _L, NH, EV, RS = st
                    NRW = NH + 1
                    q_ref = mtap_in[4 * mi + 1]
                    r_ref = mtap_in[4 * mi + 2]
                    fr_ref = mtap_in[4 * mi + 3]
                    b_idx = k * TB + j
                    slot_w = jax.lax.rem(b_idx, NRW)
                    # current input block is part of the tap window
                    # (d >= RS-C+2 > 0 keeps reads causal), so write it
                    # first; pad blocks past j_star at the final step
                    # must not corrupt the emitted ring
                    if j <= j_star:
                        mring_refs[mi][slot_w] = blk
                    else:
                        @pl.when(k < K_steps - 1)
                        def _(b=blk, mi=mi, slot_w=slot_w):
                            mring_refs[mi][slot_w] = b
                    q_j = q_ref[0, k * TB + j]
                    s_idx = q_j // C
                    off = q_j - s_idx * C              # any int, < C
                    # window = 3 consecutive ring blocks starting at
                    # signal block (b_idx - NH + s_idx); RS <= 2C and
                    # off < C keep [off, off+RS) inside the 3C concat
                    parts = []
                    for kk in range(3):
                        sl = jax.lax.rem(
                            b_idx - NH + s_idx + kk + 2 * NRW, NRW)
                        parts.append(mring_refs[mi][sl])
                    win3 = jnp.concatenate(parts, axis=1)
                    # left-rotate by off (dynamic), keep the first RS
                    sub = pltpu.roll(win3, 3 * C - off, axis=1)[:, :RS]
                    r_blk = r_ref[:, j * C:(j + 1) * C]      # [1, C] i32
                    fr_blk = fr_ref[:, j * C:(j + 1) * C]    # [1, C] f32
                    acc_a = jnp.zeros(blk.shape, f32)
                    acc_b = jnp.zeros(blk.shape, f32)
                    for ev in range(EV):
                        m = r_blk == ev
                        # where-select, not mask-multiply: 0*NaN = NaN
                        # would smear a bad sample across the window
                        acc_a = acc_a + jnp.where(m, sub[:, ev:ev + C],
                                                  f32(0))
                        acc_b = acc_b + jnp.where(
                            m, sub[:, ev + 1:ev + 1 + C], f32(0))
                    wet = acc_a * (f32(1.0) - fr_blk) + acc_b * fr_blk
                    # same f32 rounding as mtap_apply's (1.0 - mix)
                    mixf = np.float32(mix)
                    blk = (blk * (np.float32(1.0) - mixf) + wet * mixf)
                    mi += 1
                else:                                   # comb
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
                    y = blk + decay * delayed
                    if j <= j_star:
                        ring_refs[bi][slot] = y
                    else:
                        # sub-blocks past j_star are PAD at the final
                        # step: their writes would corrupt the ring's
                        # last-D window before emission
                        @pl.when(k < K_steps - 1)
                        def _(y=y, bi=bi, slot=slot):
                            ring_refs[bi][slot] = y
                    blk = y
                    bi += 1
            y_ref[:, j * C:(j + 1) * C] = blk

        @pl.when(k == K_steps - 1)
        def _():
            for b in range(n_b):
                NR = comb_geom[b][0]
                for m in range(NR):
                    ring_outs[b][:, m, :] = ring_refs[b][m]
            for mi, st in enumerate(mtaps):
                for m in range(st[3] + 1):
                    mring_outs[mi][:, m, :] = mring_refs[mi][m]

    return kernel


def chain_kernel_call(x, stages: tuple, state_in: tuple,
                      interpret: bool = False):
    """x [B, T] (T % 128 == 0) -> (y [B, T],
    per-cascade (carry_last [B, NS], x_last [B, C]),
    per-comb ring [B, NR, C],
    per-tap emitted sequence [B, T])."""
    f32 = jnp.float32
    x = jnp.asarray(x, f32)
    B, T = x.shape
    K = T // C
    bt = pick_bt(stages, B)
    assert bt is not None, "chain_kernel_call: rings exceed the VMEM budget"
    TB = _pick_tb(K, cap=8 if bt == 256 else None)
    K_steps = -(-K // TB)
    Bp = -(-B // bt) * bt
    Tp = K_steps * TB * C
    xp = jnp.pad(x, ((0, Bp - B), (0, Tp - T)))

    cascades = [st for st in stages if st[0] == "cascade"]
    combs = [st for st in stages if st[0] == "comb"]
    n_c, n_b = len(cascades), len(combs)
    n_t = sum(1 for st in stages if st[0] == "tap")

    # operands: per-cascade constants + padded initial states, per-comb
    # padded history blocks
    ops = [xp]
    in_specs = [pl.BlockSpec((bt, TB * C), lambda i, k: (i, k),
                             memory_space=pltpu.VMEM)]
    const_spec = lambda shp: pl.BlockSpec(shp, lambda i, k: tuple(
        0 for _ in shp), memory_space=pltpu.VMEM)
    si = 0
    s0s = []
    hists = []
    mtap_ops = []          # per mtap: (histp, q, r, frac)
    state_iter = list(state_in)
    for st in stages:
        if st[0] == "cascade":
            s0 = jnp.asarray(state_iter[si], f32)
            si += 1
            N = s0.shape[-1]
            s0p = jnp.pad(s0, ((0, Bp - B), (0, NS - N)))
            s0s.append(s0p)
        elif st[0] == "comb":
            hist = jnp.asarray(state_iter[si], f32)
            si += 1
            D = st[2]
            NR = -(-D // C)
            off = NR * C - D
            hp = jnp.pad(hist, ((0, Bp - B), (off, 0)))
            hists.append(hp)
        elif st[0] == "mtap":
            hist, q, r, fr = state_iter[si:si + 4]
            si += 4
            _, _mix, L, NH, EV, RS = st
            pad0 = NH * C - L
            hp = jnp.pad(jnp.asarray(hist, f32), ((0, Bp - B), (pad0, 0)))
            qp = jnp.pad(jnp.asarray(q, jnp.int32),
                         (0, K_steps * TB - q.shape[-1]))[None, :]
            rp = jnp.pad(jnp.asarray(r, jnp.int32), (0, Tp - T))[None, :]
            frp = jnp.pad(jnp.asarray(fr, f32), (0, Tp - T))[None, :]
            mtap_ops.append((hp, qp, rp, frp))
    for st in cascades:
        Ltg, Wp, Ecb, ACt, _, _ = _casc_consts(st[1])
        ops += [jnp.asarray(Ltg), jnp.asarray(Wp), jnp.asarray(Ecb),
                jnp.asarray(ACt)]
        in_specs += [const_spec((C, C)), const_spec((C, NS)),
                     const_spec((NS, C)), const_spec((NS, NS))]
    for s0p in s0s:
        ops.append(s0p)
        in_specs.append(pl.BlockSpec((bt, NS), lambda i, k: (i, 0),
                                     memory_space=pltpu.VMEM))
    for hp in hists:
        NRC = hp.shape[-1]
        ops.append(hp)
        in_specs.append(pl.BlockSpec((bt, NRC), lambda i, k: (i, 0),
                                     memory_space=pltpu.VMEM))
    for hp, qp, rp, frp in mtap_ops:
        ops += [hp, qp, rp, frp]
        in_specs += [
            pl.BlockSpec((bt, hp.shape[-1]), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K_steps * TB), lambda i, k: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TB * C), lambda i, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB * C), lambda i, k: (0, k),
                         memory_space=pltpu.VMEM),
        ]

    seq_spec = pl.BlockSpec((bt, TB * C), lambda i, k: (i, k),
                            memory_space=pltpu.VMEM)
    out_specs = [seq_spec] * (1 + n_t)
    out_shape = [jax.ShapeDtypeStruct((Bp, Tp), f32)] * (1 + n_t)
    for _ in cascades:
        for _k in range(2):
            out_specs.append(pl.BlockSpec((bt, C), lambda i, k: (i, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((Bp, C), f32))
    scratch = [pltpu.VMEM((bt, NS), f32) for _ in cascades]
    for st in combs:
        NR = -(-st[2] // C)
        out_specs.append(pl.BlockSpec((bt, NR, C),
                                      lambda i, k: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((Bp, NR, C), f32))
        scratch.append(pltpu.VMEM((NR, bt, C), f32))
    mtaps = [st for st in stages if st[0] == "mtap"]
    n_m = len(mtaps)
    for st in mtaps:
        NRW = st[3] + 1
        out_specs.append(pl.BlockSpec((bt, NRW, C),
                                      lambda i, k: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((Bp, NRW, C), f32))
        scratch.append(pltpu.VMEM((NRW, bt, C), f32))

    from dsp_stuff_tpu.ops.pallas_math import safe_transcendentals
    kernel = _build_kernel(tuple(stages), TB, K, K_steps)
    with jax.enable_x64(False), safe_transcendentals():
        outs = pl.pallas_call(
            kernel,
            grid=(Bp // bt, K_steps),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=scratch,
            compiler_params=mega_compiler_params(
                vmem_limit_for(stages, bt, 2 + n_t)),
            interpret=interpret,
        )(*ops)

    y = outs[0][:B, :T]
    taps = tuple(outs[1 + t][:B, :T] for t in range(n_t))
    o = 1 + n_t
    casc_raw = []
    for c in range(n_c):
        carry = outs[o + 2 * c][:B, :NS]
        x_last = outs[o + 2 * c + 1][:B, :]
        casc_raw.append((carry, x_last))
    comb_rings = [outs[o + 2 * n_c + b][:B] for b in range(n_b)]
    mtap_rings = [outs[o + 2 * n_c + n_b + m][:B] for m in range(n_m)]
    # ring_raw in STAGE order (comb and mtap interleaved as they occur)
    ring_raw = []
    bi = mi = 0
    for st in stages:
        if st[0] == "comb":
            ring_raw.append(comb_rings[bi])
            bi += 1
        elif st[0] == "mtap":
            ring_raw.append(mtap_rings[mi])
            mi += 1
    return y, tuple(casc_raw), tuple(ring_raw), taps
