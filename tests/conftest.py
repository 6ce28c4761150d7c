"""Test config: CPU backend with a virtual 8-device mesh.

The reference of record for multi-chip sharding tests; real-TPU benchmarking
happens in bench.py.  The container's sitecustomize force-registers the TPU
('axon') backend and sets JAX_PLATFORMS=axon, so env vars alone don't stick —
we must set XLA_FLAGS before backend init and then override jax_platforms via
jax.config (which wins over the env).  Set DST_TEST_TPU=1 to run the suite on
the real chip instead (f64 emulation there has broken transcendental tails;
a few parity-policy tests may be skipped).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if not os.environ.get("DST_TEST_TPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

import pytest

# Whole-graph bitwise assertions under the 'exact' policy are scoped to
# the CPU backend (PARITY.md "Backend scope"): on TPU the FMA/convert-sink
# fence lowers to a best-effort optimization_barrier and graph-level
# fusion re-contracts ops the fence pins on CPU.  On-chip the contract is
# the parity policy's -90 dBFS budget, which the parity fuzz/oracle tests
# (which DO run on chip) enforce.
ON_TPU = bool(os.environ.get("DST_TEST_TPU"))
bitwise_cpu_only = pytest.mark.skipif(
    ON_TPU, reason="exact-policy bitwise contract is CPU-only "
                   "(PARITY.md Backend scope); on-chip contract is the "
                   "parity policy's -90 dBFS budget")


@pytest.fixture(autouse=True)
def _restore_precision_policy():
    """Tests default to the 'parity' policy; anything that switches policy
    (directly or via entry points) must not leak into later tests."""
    from dsp_stuff_tpu.utils import precision
    prev = precision.get_policy()
    yield
    precision.set_policy(prev)
