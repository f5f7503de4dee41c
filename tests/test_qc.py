"""QC block-structure and fast roll-based min-sum decoder tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from labrador_ldpc_tpu.codes.expand import (
    parity_edges,
    qc_structure,
)
from labrador_ldpc_tpu.codes.params import ALL_CODES, get_code
from labrador_ldpc_tpu.ops.convert import hard_to_llrs, pack_bits
from labrador_ldpc_tpu.ops.encoder import encode_bits
from labrador_ldpc_tpu.ops.minsum import make_ms_decoder
from labrador_ldpc_tpu.ops.qc_minsum import make_ms_decoder_qc, perm_rows

CODES = [c.value for c in ALL_CODES]
SMALL = ["TC128", "TC256", "TM1280"]


@pytest.mark.parametrize("name", CODES)
def test_qc_structure_matches_parity_edges(name):
    """The QC addend permutations must enumerate exactly the reference's
    edge set (codes/mod.rs:294-362): edge (r*M+i, c*M+perm(i)) per addend."""
    code = get_code(name)
    s = qc_structure(code)
    i = np.arange(s.m)
    edges = []
    for row in s.rows:
        for perm in row:
            chk = perm.row * s.m + i
            var = perm.col * s.m + perm.apply(i, s.m)
            edges.append(np.stack([chk, var], axis=1))
    got = np.concatenate(edges, axis=0)
    want = parity_edges(code)
    assert got.shape == want.shape
    # set equality (order differs: QC groups by row, reference scans rows too
    # but interleaves plane chains identically; compare sorted)
    got_s = got[np.lexsort((got[:, 1], got[:, 0]))]
    want_s = want[np.lexsort((want[:, 1], want[:, 0]))]
    np.testing.assert_array_equal(got_s, want_s)


@pytest.mark.parametrize("name", SMALL)
def test_perm_rows_forward_inverse(name):
    code = get_code(name)
    s = qc_structure(code)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((s.m, 4)), jnp.float32)
    for row in s.rows:
        for perm in row:
            fwd = np.asarray(perm_rows(x, perm))
            # fwd[i] == x[perm(i)]
            pi = perm.apply(np.arange(s.m), s.m)
            np.testing.assert_array_equal(fwd, np.asarray(x)[pi])
            # inverse round-trips
            back = np.asarray(perm_rows(jnp.asarray(fwd), perm, inverse=True))
            np.testing.assert_array_equal(back, np.asarray(x))


@pytest.mark.parametrize("name", CODES)
def test_qc_decode_three_bit_flips(name):
    """Reference scenario (decoder.rs:671-699): flip 3 bits, decode, recover."""
    code = get_code(name)
    B = 4
    rng = np.random.default_rng(7)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    rx = cw.copy()
    rx[:, [0, 3, 5]] ^= 1
    llrs = hard_to_llrs(pack_bits(jnp.asarray(rx)), jnp.float32)
    dec = make_ms_decoder_qc(code, jnp.float32, maxiters=50)
    res = dec(llrs)
    assert bool(np.asarray(res.success).all())
    got = np.asarray(res.bits)[:, : code.n]
    np.testing.assert_array_equal(got, cw)


@pytest.mark.parametrize("name", SMALL)
def test_qc_matches_reference_order_decoder(name):
    """On noisy-but-decodable inputs both implementations must converge to
    the same codeword (bit output), despite different fp accumulation order."""
    code = get_code(name)
    B = 8
    rng = np.random.default_rng(3)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    tx = 1.0 - 2.0 * cw.astype(np.float32)
    noisy = tx + 0.4 * rng.standard_normal(tx.shape).astype(np.float32)
    llrs = jnp.asarray(noisy)
    r_ref = make_ms_decoder(code, jnp.float32, maxiters=30)(llrs)
    r_qc = make_ms_decoder_qc(code, jnp.float32, maxiters=30)(llrs)
    ok = np.asarray(r_ref.success) & np.asarray(r_qc.success)
    assert ok.any(), "expected some convergence at this noise level"
    np.testing.assert_array_equal(
        np.asarray(r_qc.bits)[ok], np.asarray(r_ref.bits)[ok]
    )
    np.testing.assert_array_equal(
        np.asarray(r_qc.iterations)[ok], np.asarray(r_ref.iterations)[ok]
    )


def test_qc_normalized_minsum_smoke():
    code = get_code("TC128")
    B = 4
    rng = np.random.default_rng(11)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    rx = cw.copy()
    rx[:, [1, 9]] ^= 1
    llrs = hard_to_llrs(pack_bits(jnp.asarray(rx)), jnp.float32)
    res = make_ms_decoder_qc(code, jnp.float32, maxiters=50, alpha=0.8)(llrs)
    assert bool(np.asarray(res.success).all())
    np.testing.assert_array_equal(np.asarray(res.bits)[:, : code.n], cw)


def test_qc_rejects_int_dtype():
    with pytest.raises(ValueError):
        make_ms_decoder_qc("TC128", jnp.int8)


@pytest.mark.parametrize("name", ["TC128", "TM1280", "TM8192"])
def test_layered_three_bit_flips(name):
    """Layered schedule recovers the reference scenario on all code types."""
    from labrador_ldpc_tpu.ops.qc_minsum import make_ms_decoder_layered

    code = get_code(name)
    B = 4
    rng = np.random.default_rng(13)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    rx = cw.copy()
    rx[:, [0, 3, 5]] ^= 1
    llrs = hard_to_llrs(pack_bits(jnp.asarray(rx)), jnp.float32)
    res = make_ms_decoder_layered(code, jnp.float32, maxiters=50)(llrs)
    assert bool(np.asarray(res.success).all())
    np.testing.assert_array_equal(np.asarray(res.bits)[:, : code.n], cw)
    # layered reaches convergence in fewer iterations than flooding
    r_flood = make_ms_decoder_qc(code, jnp.float32, maxiters=50)(llrs)
    assert (np.asarray(res.iterations) <= np.asarray(r_flood.iterations)).all()


def test_layered_success_implies_valid_codeword():
    """success=True must mean a zero syndrome (end-of-iteration check, not
    the stale per-layer parities)."""
    from labrador_ldpc_tpu.codes.expand import parity_check_matrix
    from labrador_ldpc_tpu.ops.qc_minsum import make_ms_decoder_layered

    code = get_code("TC256")
    B = 64
    rng = np.random.default_rng(14)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    tx = 1.0 - 2.0 * cw.astype(np.float32)
    noisy = jnp.asarray(tx + 0.65 * rng.standard_normal(tx.shape).astype(np.float32))
    res = make_ms_decoder_layered(code, jnp.float32, maxiters=20)(noisy)
    H = parity_check_matrix(code)
    bits = np.asarray(res.bits)
    for i in np.nonzero(np.asarray(res.success))[0]:
        assert int(((H @ bits[i]) & 1).sum()) == 0


def test_qc_i8_decodes_all_codes():
    """Saturating int8 QC path: 3-bit-flip recovery + valid-codeword checks."""
    from labrador_ldpc_tpu.ops.qc_minsum import make_ms_decoder_qc_i8

    for name in ("TC256", "TM2048"):
        code = get_code(name)
        B = 8
        rng = np.random.default_rng(31)
        data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
        cw = np.asarray(encode_bits(code, jnp.asarray(data)))
        rx = cw.copy()
        rx[:, [0, 3, 5]] ^= 1
        llrs = jnp.asarray(np.where(rx == 1, -4, 4).astype(np.int8))
        res = make_ms_decoder_qc_i8(code, maxiters=50)(llrs)
        assert bool(np.asarray(res.success).all())
        np.testing.assert_array_equal(np.asarray(res.bits)[:, : code.n], cw)


def test_qc_i8_saturation_does_not_break_convergence():
    """Extreme +-127 inputs exercise the saturating clamps."""
    from labrador_ldpc_tpu.ops.qc_minsum import make_ms_decoder_qc_i8

    code = get_code("TC128")
    rng = np.random.default_rng(32)
    data = rng.integers(0, 2, (4, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    rx = cw.copy()
    rx[:, [2, 40]] ^= 1
    llrs = jnp.asarray(np.where(rx == 1, -127, 127).astype(np.int8))
    res = make_ms_decoder_qc_i8(code, maxiters=50)(llrs)
    assert bool(np.asarray(res.success).all())
    np.testing.assert_array_equal(np.asarray(res.bits)[:, : code.n], cw)


def test_qc_bf16_decodes():
    """bfloat16 QC path recovers the reference scenario."""
    code = get_code("TM2048")
    B = 8
    rng = np.random.default_rng(33)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    rx = cw.copy()
    rx[:, [0, 3, 5]] ^= 1
    llrs = hard_to_llrs(pack_bits(jnp.asarray(rx)), jnp.bfloat16)
    res = make_ms_decoder_qc(code, jnp.bfloat16, maxiters=50)(llrs)
    assert bool(np.asarray(res.success).all())
    np.testing.assert_array_equal(np.asarray(res.bits)[:, : code.n], cw)
