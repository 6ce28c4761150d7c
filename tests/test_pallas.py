"""Pallas TPU kernel (ops/pallas_scan.py) vs the oracle — interpret mode
keeps these runnable on the CPU test backend; the compiled path is
exercised on real hardware by bench.py / DST_PALLAS=1."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsp_stuff_tpu.ops.pallas_scan import first_order_pallas

import oracle


@pytest.mark.parametrize("T", [100, 8192, 20000])
def test_first_order_pallas_interpret(T):
    x = np.random.default_rng(0).standard_normal(T).astype(np.float32)
    got = np.asarray(first_order_pallas(
        np.float32(0.9), x * np.float32(0.1), np.float32(0.3),
        interpret=True))
    want, _ = oracle.low_pass(x, 0.9, np.float32(0.3))
    db = oracle.max_err_dbfs(got, want)
    assert db <= -90.0, db


def test_first_order_pallas_batch():
    xb = np.random.default_rng(1).standard_normal((3, 9000)).astype(np.float32)
    got = np.asarray(first_order_pallas(
        np.float32(0.8), xb * np.float32(0.2), np.float32(0.0),
        interpret=True))
    for i in range(3):
        # oracle.low_pass computes b = x*(1-r); here b = x*0.2 == x*(1-0.8)
        want, _ = oracle.low_pass(xb[i], 0.8)
        db = oracle.max_err_dbfs(got[i], want)
        assert db <= -90.0, (i, db)


def test_first_order_pallas_under_vmap():
    """The kernel must lift through vmap (batched graph renders)."""
    xb = np.random.default_rng(2).standard_normal((4, 4096)).astype(np.float32)
    f = jax.vmap(lambda b: first_order_pallas(
        np.float32(0.7), b, np.float32(0.0), interpret=True))
    got = np.asarray(f(xb * np.float32(0.3)))
    want, _ = oracle.low_pass(xb[2], 0.7)
    db = oracle.max_err_dbfs(got[2], want)
    assert db <= -90.0, db


def test_envelope_pallas_interpret():
    """Plain Pallas envelope kernel vs the sequential scan."""
    from dsp_stuff_tpu.ops.pallas_envelope import peak_envelope_pallas
    from dsp_stuff_tpu.ops import envelope as env_ops
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((3, 2100)) * 0.7).astype(np.float32)
    atk = env_ops.gain_from_frames(5.0)
    rel = env_ops.gain_from_frames(40.0)
    e0 = np.float32([0.0, 0.4, 1.7])
    got, fin = peak_envelope_pallas(x, atk, rel, e0, interpret=True)
    want, wfin = env_ops._seq_scan(jnp.asarray(x), atk, rel,
                                   jnp.asarray(e0))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(fin), np.asarray(wfin))


def test_envelope_pallas_chunked_interpret():
    """Chunk-parallel Pallas envelope (chunks on sublanes) vs the
    sequential scan: bitwise after the contraction warm-up, for a chunk
    small enough to test but long vs the gains' memory."""
    from dsp_stuff_tpu.ops.pallas_envelope import peak_envelope_pallas_chunked
    from dsp_stuff_tpu.ops import envelope as env_ops
    rng = np.random.default_rng(4)
    T = 512 * 9 + 301                     # ragged tail + P=10 chunks
    x = (rng.standard_normal((2, T)) * 0.6).astype(np.float32)
    atk = env_ops.gain_from_frames(4.0)
    rel = env_ops.gain_from_frames(12.0)  # g^512 = e^-42: converged
    e0 = np.float32([0.3, 0.0])
    got, fin = peak_envelope_pallas_chunked(x, atk, rel, e0, chunk=512,
                                            interpret=True)
    want, wfin = env_ops._seq_scan(jnp.asarray(x), atk, rel,
                                   jnp.asarray(e0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-7)
    np.testing.assert_allclose(np.asarray(fin), np.asarray(wfin),
                               rtol=0, atol=2e-7)
