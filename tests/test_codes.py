"""Codes-layer tests: H expansion pins, generator pins, parameter registry.

Mirrors the reference's oracles:
  * test_iter_parity (codes/mod.rs:517-535): edge count == paritycheck_sum and
    CRC32 over the (check, var) stream — we reproduce the reference's exact
    iteration order, so the same nine CRCs pin both content and order.
  * test_encode (encoder.rs:361-527): golden parity vectors for all 9 codes.
  * working-length consts (decoder.rs:531-551).
"""

import numpy as np
import pytest

from labrador_ldpc_tpu.codes.expand import (
    decoder_tables,
    generator_parity_matrix,
    parity_check_matrix,
    parity_edges,
)
from labrador_ldpc_tpu.codes.params import ALL_CODES, LDPCCode, get_code

from golden_vectors import GOLDEN_PARITY

# CRCs manually verified by the reference (codes/mod.rs:521-523)
EDGE_CRCS = {
    "TC128": 0x13A9D28D, "TC256": 0xC3CC7625, "TC512": 0x66EA9A48,
    "TM1280": 0xB643C99E, "TM1536": 0x8169E0CF, "TM2048": 0x599A0807,
    "TM5120": 0xD0E794B1, "TM6144": 0xBD0AB764, "TM8192": 0x9003014C,
}


def _crc32_u16(crc: int, data: int) -> int:
    crc ^= data
    for _ in range(16):
        mask = 0xFFFFFFFF if crc & 1 else 0
        crc = (crc >> 1) ^ (0xEDB88320 & mask)
    return crc


@pytest.mark.parametrize("code", ALL_CODES, ids=str)
def test_edge_expansion_pinned(code):
    edges = parity_edges(code)
    assert edges.shape == (code.paritycheck_sum, 2)
    crc = 0xFFFFFFFF
    for c, v in edges:
        crc = _crc32_u16(crc, int(c))
        crc = _crc32_u16(crc, int(v))
    assert crc == EDGE_CRCS[code.value]


@pytest.mark.parametrize("code", ALL_CODES, ids=str)
def test_golden_encode(code):
    p = code.params
    data = np.arange(p.k // 8, dtype=np.uint8)
    dbits = np.unpackbits(data)
    parity = np.packbits((dbits @ generator_parity_matrix(code)) & 1)
    assert parity.tobytes() == GOLDEN_PARITY[code.value]


@pytest.mark.parametrize("code", [LDPCCode.TC128, LDPCCode.TC256, LDPCCode.TC512], ids=str)
def test_h_g_orthogonal_tc(code):
    """H . G^T = 0 over GF(2) for the non-punctured codes."""
    p = code.params
    H = parity_check_matrix(code)
    G = generator_parity_matrix(code)
    full_g = np.concatenate([np.eye(p.k, dtype=np.uint8), G], axis=1)  # (k, n)
    assert ((H @ full_g.T) & 1).max() == 0


@pytest.mark.parametrize("code", ALL_CODES, ids=str)
def test_h_g_orthogonal_all_codes(code):
    """H . G^T = 0 over the FULL (n+p)-variable H for all 9 codes — the
    punctured analog of the reference's cross-pins (codes/mod.rs:497-535).

    For TM codes the transmitted codeword omits p parity bits; the implied
    full generator's punctured columns are recovered by erasure-repairing a
    clean codeword (ops/bitflip.py decode_erasures_bits, the reference's
    decode_erasures, decoder.rs:144-223), then every check of the full H
    must be satisfied. Data vectors are a dense pseudo-random batch plus the
    all-zero word, so G's columns and the erasure fill are exercised beyond
    the golden byte pattern."""
    import jax.numpy as jnp

    from labrador_ldpc_tpu.ops.bitflip import decode_erasures_bits
    from labrador_ldpc_tpu.ops.encoder import encode_bits

    p = code.params
    H = parity_check_matrix(code)  # (n+p-k, n+p)
    rng = np.random.default_rng(5)
    data = rng.integers(0, 2, (16, p.k), dtype=np.uint8)
    data[0] = 0  # all-zero data -> all-zero codeword must also pass
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))  # (B, n)
    if p.punctured_bits:
        padded = np.concatenate(
            [cw, np.zeros((cw.shape[0], p.punctured_bits), np.uint8)], axis=1
        )
        ok, _, full = decode_erasures_bits(code, jnp.asarray(padded), maxiters=8)
        full = np.asarray(full)
        assert bool(np.asarray(ok).all())
        np.testing.assert_array_equal(full[:, : p.n], cw)
    else:
        full = cw
    assert ((full @ H.T) & 1).max() == 0


def test_params_registry():
    # pinned against reference src/codes/mod.rs:109-241
    p = get_code("TM8192").params
    assert (p.n, p.k, p.punctured_bits) == (8192, 4096, 2048)
    assert p.submatrix_size == 2048 and p.circulant_size == 512
    assert p.paritycheck_sum == 30720
    assert p.decode_bf_working_len == 8192 + 2048
    assert p.decode_ms_working_len == 2 * 30720 + 3 * 8192 + 3 * 2048 - 2 * 4096
    assert p.decode_ms_working_u8_len == (8192 + 2048 - 4096) // 8
    assert p.output_len == (8192 + 2048) // 8
    assert get_code("tc128") is LDPCCode.TC128
    with pytest.raises(ValueError):
        get_code("TC1024")


@pytest.mark.parametrize("code", ALL_CODES, ids=str)
def test_decoder_tables_consistency(code):
    t = decoder_tables(code)
    edges = parity_edges(code)
    # every reference edge appears exactly once in the check-major grid
    assert t.ref_edge_slot.shape == (code.paritycheck_sum,)
    assert len(np.unique(t.ref_edge_slot)) == code.paritycheck_sum
    grid_chk = t.ref_edge_slot // t.dc_max
    assert np.array_equal(grid_chk, edges[:, 0])
    assert np.array_equal(
        t.check_nbrs.reshape(-1)[t.ref_edge_slot], edges[:, 1].astype(np.int32)
    )
    # masks consistent with degrees
    assert t.check_mask.sum() == code.paritycheck_sum
    assert t.var_mask.sum() == code.paritycheck_sum
    # var tables point at the right checks
    flat_chk = t.var_edge_idx[t.var_mask] // t.dc_max
    assert np.array_equal(flat_chk, t.var_check_idx[t.var_mask])


@pytest.mark.parametrize("code", ALL_CODES, ids=str)
def test_encode_onto_matches_copy_encode(code):
    """encode_onto (the reference's in-place `encode(&mut codeword)`,
    encoder.rs:293-307: parity computed from the data already in the
    codeword head) returns the same bytes as copy-style encode, with the
    buffer's stale tail ignored."""
    import jax.numpy as jnp

    from labrador_ldpc_tpu.ops.encoder import encode, encode_onto

    p = code.params
    rng = np.random.default_rng(9)
    data = rng.integers(0, 256, (4, p.k // 8), dtype=np.uint8)
    buf = rng.integers(0, 256, (4, p.n // 8), dtype=np.uint8)  # garbage tail
    buf[:, : p.k // 8] = data
    out = np.asarray(encode_onto(code, jnp.asarray(buf)))
    ref = np.asarray(encode(code, jnp.asarray(data)))
    np.testing.assert_array_equal(out, ref)
