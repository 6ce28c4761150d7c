"""On-chip measurement: what the fused-chorus ("mtap") chain-segment
stage buys at batch — config2 (reverb -> chorus -> gain) and config5
(high_pass -> chorus pair) batch-512 aggregates with the chorus stage
fused vs excluded from mega planning (the r4 behavior, where the chorus
split the chain into separate HBM passes).

Each case runs in a subprocess; one JSON line per case.

Usage: python tools/measure_mtap.py [case ...]
"""

import json
import os
import subprocess
import sys

SNIPPET = """
import sys, json
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import numpy as np
import bench
from dsp_stuff_tpu.compiler import compile as compile_mod

cfg = {cfg!r}
if {fused!r} == "off":
    # exclude the chorus from mega planning (the r4 behavior)
    compile_mod._chorus_mega_geo = lambda node: None
rng = np.random.default_rng(0)
r, gb = bench._config_batched_metric(cfg, rng, 512)
print(json.dumps({{"rtf_aggregate": round(r, 1), "gbps": gb}}))
"""

CASES = {
    "config2_mtap_on": ("config2", "on"),
    "config2_mtap_off": ("config2", "off"),
    "config5_mtap_on": ("config5", "on"),
    "config5_mtap_off": ("config5", "off"),
}


def main():
    names = sys.argv[1:] or list(CASES)
    for name in names:
        cfg, fused = CASES[name]
        code = SNIPPET.format(cfg=cfg, fused=fused)
        try:
            p = subprocess.run([sys.executable, "-c", code],
                               env=dict(os.environ), capture_output=True,
                               text=True, timeout=2400)
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
