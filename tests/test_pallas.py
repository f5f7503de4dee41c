"""Pallas fused min-sum decoder tests (interpreter mode on CPU).

The compiled Mosaic kernel is exercised on real TPU hardware by bench.py and
the verify drive; here the same kernel body runs under the Pallas
interpreter to pin its semantics against the XLA QC decoder bit-for-bit.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from labrador_ldpc_tpu.codes.params import get_code
from labrador_ldpc_tpu.ops.convert import hard_to_llrs, pack_bits
from labrador_ldpc_tpu.ops.encoder import encode_bits
from labrador_ldpc_tpu.ops.minsum import make_ms_decoder
from labrador_ldpc_tpu.ops.pallas_minsum import default_batch_tile, make_ms_decoder_pallas
from labrador_ldpc_tpu.ops.qc_minsum import make_ms_decoder_qc

# keep interpreter runtime sane: small codes incl. one punctured TM code
CODES = ["TC128", "TC256", "TM1280"]


@pytest.mark.parametrize("name", CODES)
def test_pallas_three_bit_flips(name):
    code = get_code(name)
    B = 64
    rng = np.random.default_rng(7)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    rx = cw.copy()
    rx[:, [0, 3, 5]] ^= 1
    llrs = hard_to_llrs(pack_bits(jnp.asarray(rx)), jnp.float32)
    dec = make_ms_decoder_pallas(code, jnp.float32, maxiters=50, batch_tile=32,
                                 interpret=True)
    res = dec(llrs)
    assert bool(np.asarray(res.success).all())
    np.testing.assert_array_equal(np.asarray(res.bits)[:, : code.n], cw)


@pytest.mark.parametrize("name", ["TC128", "TM1280"])
def test_pallas_matches_qc_xla_f32(name):
    """f32: bit-identical to the XLA QC decoder (same update order)."""
    code = get_code(name)
    B = 32
    rng = np.random.default_rng(3)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    tx = 1.0 - 2.0 * cw.astype(np.float32)
    noisy = jnp.asarray(tx + 0.4 * rng.standard_normal(tx.shape).astype(np.float32))
    r_p = make_ms_decoder_pallas(code, jnp.float32, maxiters=30, batch_tile=32,
                                 interpret=True)(noisy)
    r_q = make_ms_decoder_qc(code, jnp.float32, maxiters=30)(noisy)
    np.testing.assert_array_equal(np.asarray(r_p.bits), np.asarray(r_q.bits))
    np.testing.assert_array_equal(np.asarray(r_p.success), np.asarray(r_q.success))
    np.testing.assert_array_equal(np.asarray(r_p.iterations), np.asarray(r_q.iterations))


def test_pallas_bf16_decodes():
    code = get_code("TC256")
    B = 32
    rng = np.random.default_rng(5)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    rx = cw.copy()
    rx[:, [1, 8]] ^= 1
    llrs = hard_to_llrs(pack_bits(jnp.asarray(rx)), jnp.bfloat16)
    res = make_ms_decoder_pallas(code, jnp.bfloat16, maxiters=50, batch_tile=32,
                                 interpret=True)(llrs)
    assert bool(np.asarray(res.success).all())
    np.testing.assert_array_equal(np.asarray(res.bits)[:, : code.n], cw)


def test_pallas_multi_tile_grid():
    """B > batch_tile exercises the grid dimension and per-tile early exit."""
    code = get_code("TC128")
    B, Bt = 64, 16
    rng = np.random.default_rng(9)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    rx = cw.copy()
    rx[: B // 2, [0, 3, 5]] ^= 1  # first half corrupted, second clean
    llrs = hard_to_llrs(pack_bits(jnp.asarray(rx)), jnp.float32)
    res = make_ms_decoder_pallas(code, jnp.float32, maxiters=50, batch_tile=Bt,
                                 interpret=True)(llrs)
    assert bool(np.asarray(res.success).all())
    np.testing.assert_array_equal(np.asarray(res.bits)[:, : code.n], cw)
    iters = np.asarray(res.iterations)
    assert (iters[B // 2 :] == 0).all()  # clean codewords converge at iter 0


def test_pallas_rejects_bad_inputs():
    with pytest.raises(ValueError):
        make_ms_decoder_pallas("TC128", jnp.int8)
    dec = make_ms_decoder_pallas("TC128", jnp.float32, maxiters=5, batch_tile=32,
                                 interpret=True)
    with pytest.raises(AssertionError):
        dec(jnp.zeros((33, 128), jnp.float32))  # not a tile multiple


def test_default_batch_tile_fits_all_codes():
    from labrador_ldpc_tpu.codes.params import ALL_CODES

    for c in ALL_CODES:
        for dt in (jnp.float32, jnp.bfloat16):
            bt = default_batch_tile(c, dt)
            assert bt % 64 == 0 and 64 <= bt <= 512


# ---------------------------------------------------------------------------
# pallas_qc: VMEM-resident fused QC kernel (M >= 512 TM codes)
# ---------------------------------------------------------------------------

from labrador_ldpc_tpu.ops.pallas_qc import make_ms_decoder_pallas_qc


def test_pallas_qc_matches_qc_xla_f32():
    """f32: bit-identical (bits/success/iterations) to the XLA QC decoder,
    on a noisy batch that is NOT a tile multiple (exercises padding)."""
    code = get_code("TM2048")
    B = 10
    rng = np.random.default_rng(11)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    tx = 1.0 - 2.0 * cw.astype(np.float32)
    noisy = jnp.asarray(tx + 0.5 * rng.standard_normal(tx.shape).astype(np.float32))
    r_p = make_ms_decoder_pallas_qc(code, jnp.float32, maxiters=12, batch_tile=4,
                                    interpret=True)(noisy)
    r_q = make_ms_decoder_qc(code, jnp.float32, maxiters=12)(noisy)
    np.testing.assert_array_equal(np.asarray(r_p.bits), np.asarray(r_q.bits))
    np.testing.assert_array_equal(np.asarray(r_p.success), np.asarray(r_q.success))
    np.testing.assert_array_equal(np.asarray(r_p.iterations),
                                  np.asarray(r_q.iterations))


def test_pallas_qc_three_bit_flips_bf16():
    code = get_code("TM2048")
    B = 8
    rng = np.random.default_rng(13)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    rx = cw.copy()
    rx[:, [0, 3, 5]] ^= 1
    llrs = hard_to_llrs(pack_bits(jnp.asarray(rx)), jnp.bfloat16)
    res = make_ms_decoder_pallas_qc(code, jnp.bfloat16, maxiters=50, batch_tile=8,
                                    interpret=True)(llrs)
    assert bool(np.asarray(res.success).all())
    np.testing.assert_array_equal(np.asarray(res.bits)[:, : code.n], cw)


def test_pallas_qc_alpha_matches_qc_xla():
    """Normalized min-sum (alpha) parity with the XLA QC decoder."""
    code = get_code("TM2048")
    B = 4
    rng = np.random.default_rng(17)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    tx = 1.0 - 2.0 * cw.astype(np.float32)
    noisy = jnp.asarray(tx + 0.5 * rng.standard_normal(tx.shape).astype(np.float32))
    r_p = make_ms_decoder_pallas_qc(code, jnp.float32, maxiters=10, alpha=0.8,
                                    batch_tile=4, interpret=True)(noisy)
    r_q = make_ms_decoder_qc(code, jnp.float32, maxiters=10, alpha=0.8)(noisy)
    np.testing.assert_array_equal(np.asarray(r_p.bits), np.asarray(r_q.bits))
    np.testing.assert_array_equal(np.asarray(r_p.iterations),
                                  np.asarray(r_q.iterations))


def test_pallas_qc_rejects_bad_configs():
    with pytest.raises(ValueError):
        make_ms_decoder_pallas_qc("TM2048", jnp.int8)
    with pytest.raises(ValueError):
        make_ms_decoder_pallas_qc("TC128", jnp.float32)  # M < 512
