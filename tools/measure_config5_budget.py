"""Per-op cost ledger for config5 at batch (r5): where do the ~73 ms of
a B=512 x 10 s config5 render (70,503 audio-s/s) go once the cycle SCC
runs as the fused megakernel (~7 ms)?

Times each suspect standalone full-signal op at the SAME B x T through
a scanned jit (N_CHAIN iterations per host fetch — the ~27 ms fetch
and ~7 ms dispatch floors otherwise dominate; CLAUDE.md timing notes),
each op vmapped over the batch exactly as the compiled graph runs it,
then the full graph render for the total (bench protocol).

Run on the chip:  python tools/measure_config5_budget.py [B] [T_sec]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
SECS = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
SR = 48_000
T = int(SR * SECS) // 128 * 128
N_CHAIN = 12
REPS = 3


def timed(name, step, x0):
    """step: carry -> carry (pytree of [B, T] arrays); scanned N_CHAIN
    times inside one jit, one scalar fetch as the barrier."""

    @jax.jit
    def run(x):
        def body(c, _):
            return step(c), 0.
        y, _ = jax.lax.scan(body, x, None, length=N_CHAIN)
        return jnp.sum(jax.tree.leaves(y)[0][..., -8:])

    float(run(x0))                      # compile + warm
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(run(x0))
        best = min(best, time.perf_counter() - t0)
    ms = (best * 1e3 - 27.0) / N_CHAIN  # subtract the fetch round-trip
    print(json.dumps({"op": name, "ms_per_pass": round(ms, 2),
                      "agg_audio_s_per_s": round(B * SECS / (ms / 1e3))}),
          flush=True)
    return ms


def main():
    from dsp_stuff_tpu.ops import envelope, scan as dscan, fftspec, shaping
    from dsp_stuff_tpu.utils import precision

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T)) * 0.25, jnp.float32)

    with precision.policy("fast"):
        timed("envelope(attack50/release400)",
              jax.vmap(lambda v: envelope.peak_envelope(
                  v, 50.0 * 48, 400.0 * 48)[0]), x)
        timed("biquad_solo",
              jax.vmap(lambda v: dscan.biquad_df1(
                  v, -0.2, 0.0, 0.8, 0.0, 0.0)[0]), x)
        timed("mix(two_reads_one_write)",
              lambda c: (0.4 * c[0] + 0.6 * c[1], c[0]), (x, x * 0.5))
        lfo = 0.5 + 0.3 * jnp.sin(jnp.arange(T, dtype=jnp.float32) * 1e-4)
        timed("overdrive_mod(LFO drive)",
              jax.vmap(lambda v: shaping.overdrive(v, 6.0, lfo, 0.8)), x)
        timed("distort_softclip",
              jax.vmap(lambda v: shaping.soft_clip(v, 4.0)), x)
        timed("spectrogram_fft512",
              lambda v: v + jnp.mean(jax.vmap(
                  lambda r: fftspec.spectrogram(r, 512)[1])(v)) * 1e-6, x)

        # full graph total for reference (bench _time_chained_renders
        # protocol: vmapped cg.fn chained through carried state)
        from dsp_stuff_tpu.models import config5_feedback_16node
        import dsp_stuff_tpu as dst
        g, meta = config5_feedback_16node()
        cg = dst.compile_graph(g)
        xb = jnp.asarray(rng.standard_normal((B, T)) * 0.2, jnp.float32)
        state = jax.device_put(cg.broadcast_state(cg.init_state(), (B,)))
        vfn = jax.vmap(cg.fn, in_axes=(cg.state_axes(), 0, None),
                       out_axes=(cg.state_axes(), 0, 0))
        oid = cg.output_ids[0]

        @jax.jit
        def run(state, ext):
            def body(st, _):
                st, outs, _aux = vfn(st, {str(meta["input"]): ext}, None)
                return st, jnp.sum(outs[oid][..., -8:])
            st, sums = jax.lax.scan(body, state, None, length=N_CHAIN)
            return jnp.sum(sums)

        float(run(state, xb))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(run(state, xb))
            best = min(best, time.perf_counter() - t0)
        ms = (best * 1e3 - 27.0) / N_CHAIN
        print(json.dumps({"op": "config5_full_graph",
                          "ms_per_render": round(ms, 2),
                          "agg_audio_s_per_s": round(B * SECS / (ms / 1e3))}),
              flush=True)


if __name__ == "__main__":
    main()
