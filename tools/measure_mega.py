"""On-chip measurement harness for the chain-megakernel stage economics
(round-5 verdict #5): batch-512 aggregate under flag/geometry variants.

Each case runs in a SUBPROCESS (the kernel flags are read at module
import; a remote-compile failure — e.g. the BT=256 VMEM-overflow HTTP
500 — is then a recorded per-case failure, not a harness crash).  Run
on the real chip; results print as one JSON line per case.

Usage: python tools/measure_mega.py [case ...]
"""

import json
import os
import subprocess
import sys

CASES = {
    "baseline": {},
    "fused_gemm": {"DST_MEGA_FUSED_GEMM": "1"},
    "batch1024": {"DST_BENCH_MAXBATCH": "1024"},
    "batch768": {"DST_BENCH_MAXBATCH": "768"},
    "bt64": {"DST_MEGA_BT": "64"},
    "bt256": {"DST_MEGA_BT": "256"},
    "tb8": {"DST_MEGA_TB": "8"},
    "tb32": {"DST_MEGA_TB": "32"},
    # round-5 follow-ups: BT=256 previously died on the 16 MiB scoped-
    # VMEM default; DST_MEGA_VMEM_MB raises the Mosaic limit (physical
    # VMEM is 128 MiB).  dimsem declares the batch grid dim PARALLEL.
    "bt256_vmem64": {"DST_MEGA_BT": "256", "DST_MEGA_VMEM_MB": "64"},
    "bt256_tb8_vmem64": {"DST_MEGA_BT": "256", "DST_MEGA_TB": "8",
                         "DST_MEGA_VMEM_MB": "64"},
    "dimsem_parallel": {"DST_MEGA_DIMSEM": "parallel"},
    "b1024_bt256_vmem64": {"DST_BENCH_MAXBATCH": "1024",
                           "DST_MEGA_BT": "256",
                           "DST_MEGA_VMEM_MB": "64"},
}

SNIPPET = """
import sys, json
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import numpy as np
import bench
rng = np.random.default_rng(0)
r, gb = bench._max_throughput_metric(rng)
print(json.dumps({"rtf": round(r, 1), "gbps": gb,
                  "pct_roofline": bench._pct_roofline(r, 1, 1)}))
"""


def main():
    names = sys.argv[1:] or list(CASES)
    for name in names:
        env = dict(os.environ, **CASES[name])
        try:
            p = subprocess.run([sys.executable, "-c", SNIPPET], env=env,
                               capture_output=True, text=True,
                               timeout=2400)
            lines = [l for l in p.stdout.strip().splitlines()
                     if l.startswith("{")]
            if p.returncode == 0 and lines:
                res = json.loads(lines[-1])
                res.update({"case": name, "ok": True})
            else:
                tail = (p.stderr or "").strip().splitlines()
                res = {"case": name, "ok": False,
                       "error": tail[-1][:200] if tail else
                       f"rc={p.returncode}"}
        except subprocess.TimeoutExpired:
            res = {"case": name, "ok": False, "error": "timeout"}
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
