"""Fused Pallas bit-flip kernel (ops/pallas_bf.py): bit-exactness vs the
XLA QC bit-flip decoder, whose own semantics are pinned to the oracle and
the reference (decoder.rs:243-301 + the erasure preprocessor
decoder.rs:144-223). Interpret mode on the CPU mesh; compiled-on-TPU
exactness is exercised by the benchmark suite assertions."""

import numpy as np
import pytest

import jax.numpy as jnp

from labrador_ldpc_tpu.codes.params import get_code
from labrador_ldpc_tpu.ops.bitflip import make_bf_decoder_qc
from labrador_ldpc_tpu.ops.encoder import encode_bits
from labrador_ldpc_tpu.ops.pallas_bf import make_bf_decoder_pallas


def _noisy_fixture(name, B, seed, max_flips=6):
    code = get_code(name)
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    rx = cw.copy()
    for i in range(B):
        idx = rng.choice(code.n, size=rng.integers(1, max_flips + 1), replace=False)
        rx[i, idx] ^= 1
    return code, cw, rx


@pytest.mark.parametrize(
    "name", ["TM1280", "TM1536", "TM2048", "TM8192", "TC128", "TC256", "TC512"]
)
def test_pallas_bf_matches_qc_xla(name):
    """Random 1-6 bit flips: bits/success/iterations identical to the QC
    XLA decoder. TM codes exercise the in-kernel erasure voting pass
    (all TM codes are punctured); TC codes exercise the transposed
    node-major kernel (ops/pallas_tc.py) via the factory dispatch."""
    code, _, rx = _noisy_fixture(name, 6, 11)
    r_p = make_bf_decoder_pallas(code, maxiters=20, batch_tile=2,
                                 interpret=True)(jnp.asarray(rx))
    r_q = make_bf_decoder_qc(code, maxiters=20)(jnp.asarray(rx))
    np.testing.assert_array_equal(np.asarray(r_p.bits), np.asarray(r_q.bits))
    np.testing.assert_array_equal(np.asarray(r_p.success), np.asarray(r_q.success))
    np.testing.assert_array_equal(np.asarray(r_p.iterations),
                                  np.asarray(r_q.iterations))


def test_pallas_bf_failure_and_freeze():
    """Heavy corruption: some codewords fail (success False, iterations ==
    maxiters); mixed tiles with converged + unconverged codewords must
    match the XLA decoder exactly (per-codeword freeze semantics)."""
    code, cw, rx = _noisy_fixture("TM2048", 8, 17, max_flips=2)
    rng = np.random.default_rng(19)
    for i in range(0, 8, 2):  # corrupt half the batch beyond repair
        idx = rng.choice(code.n, size=200, replace=False)
        rx[i, idx] ^= 1
    r_p = make_bf_decoder_pallas(code, maxiters=8, batch_tile=4,
                                 interpret=True)(jnp.asarray(rx))
    r_q = make_bf_decoder_qc(code, maxiters=8)(jnp.asarray(rx))
    np.testing.assert_array_equal(np.asarray(r_p.bits), np.asarray(r_q.bits))
    np.testing.assert_array_equal(np.asarray(r_p.success), np.asarray(r_q.success))
    np.testing.assert_array_equal(np.asarray(r_p.iterations),
                                  np.asarray(r_q.iterations))
    assert not bool(np.asarray(r_p.success).all())
    assert bool(np.asarray(r_p.success).any())


def test_pallas_bf_clean_input_iteration_zero():
    """Clean codewords converge at iteration 0 with the erasure-repaired
    punctured tail reproduced exactly (reference accounting: erasure
    iterations contribute 0)."""
    code, cw, _ = _noisy_fixture("TM1280", 4, 23)
    r_p = make_bf_decoder_pallas(code, maxiters=20, batch_tile=4,
                                 interpret=True)(jnp.asarray(cw))
    r_q = make_bf_decoder_qc(code, maxiters=20)(jnp.asarray(cw))
    assert bool(np.asarray(r_p.success).all())
    np.testing.assert_array_equal(np.asarray(r_p.iterations), 0)
    np.testing.assert_array_equal(np.asarray(r_p.bits), np.asarray(r_q.bits))


def test_pallas_bf_batch_padding():
    """Batch not a multiple of the tile: pad codewords are dropped from
    the result and real codewords decode identically."""
    code, _, rx = _noisy_fixture("TM1536", 5, 29)
    r_p = make_bf_decoder_pallas(code, maxiters=20, batch_tile=4,
                                 interpret=True)(jnp.asarray(rx))
    r_q = make_bf_decoder_qc(code, maxiters=20)(jnp.asarray(rx))
    assert r_p.bits.shape[0] == 5
    np.testing.assert_array_equal(np.asarray(r_p.bits), np.asarray(r_q.bits))
    np.testing.assert_array_equal(np.asarray(r_p.iterations),
                                  np.asarray(r_q.iterations))


def test_pallas_bf_small_m_dispatches_to_tc_kernel():
    """M < 128 routes to the transposed TC kernel; heavy corruption mixes
    converged/failed lanes and must still match the XLA decoder exactly."""
    code, cw, rx = _noisy_fixture("TC256", 8, 31, max_flips=2)
    rng = np.random.default_rng(37)
    for i in range(0, 8, 2):  # corrupt half the batch beyond repair
        idx = rng.choice(code.n, size=60, replace=False)
        rx[i, idx] ^= 1
    r_p = make_bf_decoder_pallas(code, maxiters=8, batch_tile=4,
                                 interpret=True)(jnp.asarray(rx))
    r_q = make_bf_decoder_qc(code, maxiters=8)(jnp.asarray(rx))
    np.testing.assert_array_equal(np.asarray(r_p.bits), np.asarray(r_q.bits))
    np.testing.assert_array_equal(np.asarray(r_p.success), np.asarray(r_q.success))
    np.testing.assert_array_equal(np.asarray(r_p.iterations),
                                  np.asarray(r_q.iterations))
    assert not bool(np.asarray(r_p.success).all())
    assert bool(np.asarray(r_p.success).any())
