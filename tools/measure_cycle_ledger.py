"""Cycle-megakernel stage economics (round-5 verdict #6): per-instruction
cost ledger at batch, measured by timing synthetic block programs that
add one instruction class at a time over the pure-I/O base.

Timing protocol: n_chain kernel calls serialized inside ONE jit via a
lax.scan whose carry is the REGISTER tuple (a real data dependency, so
XLA cannot hoist the loop-invariant kernel call), one scalar fetch as
the barrier — the same fetch-amortization discipline as bench.py.

Run on the real chip: python tools/measure_cycle_ledger.py
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

# B=512 fits every one-register program; config5_shape (2 registers +
# comb ring + cascade scratch) overflows scoped VMEM at 512 by 80 KiB
# when the kernel is called directly (the compiler's planner tiles the
# batch instead) — run that case with DST_LEDGER_B=256.
B = int(os.environ.get("DST_LEDGER_B", "512"))
T = 48_000 * 10
N_CHAIN = 16
N_TIMED = 3
H = 1.0 / float(np.float32(np.float32(1.0) + np.float32(0.0001)))
H2 = 1.0 / float(np.float32(np.float32(2.0) + np.float32(0.0001)))

# program variants: every one reads one ext, writes one tap, carries one
# register (the scan dependency).  D=7200 is config5's reverb (0.15 s).
PROGRAMS = {
    "io_reg_floor": (
        ("lin2", (("ext", 0),), H, (("reg", 0),), H, 1.0, 1.0),
        ("setreg", 0),
        ("tap", 0),
    ),
    "plus_cascade": (
        ("lin2", (("ext", 0),), H, (("reg", 0),), H, 1.0, 1.0),
        ("cascade", (("lp", 0.4), ("gain", 0.45)), 0),
        ("setreg", 0),
        ("tap", 0),
    ),
    "plus_comb": (
        ("lin2", (("ext", 0),), H, (("reg", 0),), H, 1.0, 1.0),
        ("comb", 0.5, 7200, 0),
        ("setreg", 0),
        ("tap", 0),
    ),
    "plus_ew": (
        ("lin2", (("ext", 0),), H, (("reg", 0),), H, 1.0, 1.0),
        ("ew", "distort:SoftClip", (2.0,)),
        ("setreg", 0),
        ("tap", 0),
    ),
    # config5's actual SCC shape: add -> comb -> (tap+reg) -> lp->gain
    # cascade -> reg back into the add
    "config5_shape": (
        ("lin2", (("ext", 0),), H, (("reg", 0),), H, 1.0, 1.0),
        ("comb", 0.5, 7200, 0),
        ("setreg", 1),
        ("tap", 0),
        ("join", (("reg", 1),), H),
        ("cascade", (("lp", 0.4), ("gain", 0.45)), 0),
        ("setreg", 0),
    ),
}


def measure(name, program):
    import jax
    import jax.numpy as jnp
    from dsp_stuff_tpu.ops import cycle_segment as cyc
    from dsp_stuff_tpu.ops.pallas_cycle import cycle_kernel_call
    from dsp_stuff_tpu.ops.pallas_chain import _casc_consts

    n_c, n_b, n_r, n_t, n_e = cyc._program_counts(program)
    rng = np.random.default_rng(0)
    ext = jax.device_put(
        (rng.standard_normal((B, T)) * 0.2).astype(np.float32))
    regs0 = tuple(jnp.zeros((B, 128), jnp.float32) for _ in range(n_r))
    states = []
    for ins in program:
        if ins[0] == "cascade":
            N = _casc_consts(ins[1])[4]
            states.append(jnp.zeros((B, N), jnp.float32))
        elif ins[0] == "comb":
            states.append(jnp.zeros((B, ins[2]), jnp.float32))
    states = tuple(states)

    @jax.jit
    def run(ext, regs0, states):
        def body(regs, _):
            taps, regs_f, _, _ = cycle_kernel_call(
                (ext,), regs, states, program, n_t)
            return regs_f, jnp.sum(taps[0][:, -1])
        regs_f, sums = jax.lax.scan(body, regs0, None, length=N_CHAIN)
        return jnp.sum(sums)

    float(run(ext, regs0, states))              # compile + warm
    best = float("inf")
    for _ in range(N_TIMED):
        t0 = time.perf_counter()
        float(run(ext, regs0, states))
        best = min(best, time.perf_counter() - t0)
    ms_per_render = best / N_CHAIN * 1e3
    agg = B * (T / 48_000) * N_CHAIN / best
    print(json.dumps({"case": name, "ms_per_render": round(ms_per_render, 2),
                      "aggregate_audio_s_per_s": round(agg, 0)}), flush=True)
    return ms_per_render


def main():
    names = sys.argv[1:] or list(PROGRAMS)
    base = None
    for name in names:
        ms = measure(name, PROGRAMS[name])
        if name == "io_reg_floor":
            base = ms
        elif base is not None:
            print(json.dumps({"case": name + "_delta_ms",
                              "value": round(ms - base, 2)}), flush=True)


if __name__ == "__main__":
    main()
