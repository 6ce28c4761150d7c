"""Measure the CHAIN megakernel's bare I/O floor directly: a
single-scale-stage kernel at B x 10 s, renders chained through a scan
carry (real data dependency), one scalar fetch.

This is the control for the cycle kernel's measured io_reg_floor
(tools/measure_cycle_ledger.py): CLAUDE.md's "2.4 ms DMA floor" for the
chain kernel was derived by subtracting stage increments from full-chain
walls, not by timing a bare kernel — if THIS measures ~4.5-5 ms too,
the two kernels share one Mosaic I/O floor (~45-50% of the pure
read+write roofline) and there is no cycle-specific regression.

Run on the real chip: python tools/measure_chain_floor.py
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

B = int(os.environ.get("DST_FLOOR_B", "512"))
T = 48_000 * 10
N_CHAIN = 16
N_TIMED = 3


def main():
    import jax
    import jax.numpy as jnp
    from dsp_stuff_tpu.ops.pallas_chain import chain_kernel_call

    rng = np.random.default_rng(0)
    x = jax.device_put(
        (rng.standard_normal((B, T)) * 0.2).astype(np.float32))
    stages = (("scale", 0.999),)

    @jax.jit
    def run(x):
        def body(v, _):
            y, _, _, _ = chain_kernel_call(v, stages, ())
            return y, None
        y, _ = jax.lax.scan(body, x, None, length=N_CHAIN)
        return jnp.sum(y[:, -1])

    float(run(x))                                  # compile + warm
    best = float("inf")
    for _ in range(N_TIMED):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, time.perf_counter() - t0)
    ms = best / N_CHAIN * 1e3
    gb = 2 * B * T * 4 / 1e9
    print(json.dumps({
        "case": "chain_scale_floor", "B": B,
        "ms_per_render": round(ms, 2),
        "achieved_gbps": round(gb / (best / N_CHAIN), 1),
        "pct_io_roofline": round(100 * gb / (best / N_CHAIN) / 819, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
