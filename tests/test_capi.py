"""Native C API (ctypes) tests: golden vectors + differential vs the oracle."""

import numpy as np
import pytest

from labrador_ldpc_tpu import capi
from labrador_ldpc_tpu.codes.params import ALL_CODES, get_code
from labrador_ldpc_tpu.utils import oracle

from golden_vectors import GOLDEN_PARITY

CODES = [c.value for c in ALL_CODES]
FAST = ["TC128", "TC256", "TC512", "TM1280"]


def test_size_getters_match_params():
    l = capi.lib()
    for i, c in enumerate(ALL_CODES):
        p = c.params
        assert l.labrador_ldpc_code_n(i) == p.n
        assert l.labrador_ldpc_code_k(i) == p.k
        assert l.labrador_ldpc_punctured_bits(i) == p.punctured_bits
        assert l.labrador_ldpc_paritycheck_sum(i) == p.paritycheck_sum
        assert l.labrador_ldpc_bf_working_len(i) == p.decode_bf_working_len
        assert l.labrador_ldpc_ms_working_len(i) == p.decode_ms_working_len
        assert l.labrador_ldpc_ms_working_u8_len(i) == p.decode_ms_working_u8_len
        assert l.labrador_ldpc_output_len(i) == p.output_len


@pytest.mark.parametrize("name", CODES)
def test_encode_golden(name):
    """Golden parity bytes for data 0,1,2,... (encoder.rs:361-527 values)."""
    code = get_code(name)
    data = np.arange(code.k // 8, dtype=np.uint8)
    cw = capi.copy_encode(code, data)
    np.testing.assert_array_equal(cw[: code.k // 8], data)
    np.testing.assert_array_equal(
        cw[code.k // 8 :], np.frombuffer(GOLDEN_PARITY[name], dtype=np.uint8)
    )
    # encode() in-place variant agrees
    buf = np.zeros(code.n // 8, np.uint8)
    buf[: code.k // 8] = data
    np.testing.assert_array_equal(capi.encode(code, buf), cw)


@pytest.mark.parametrize("name", FAST)
@pytest.mark.parametrize("dtype", [np.int8, np.int16, np.float32, np.float64])
def test_decode_ms_three_bit_flips(name, dtype):
    """Reference scenario (decoder.rs:671-699): 3 bit flips recovered."""
    code = get_code(name)
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, code.k // 8, dtype=np.uint8)
    cw = capi.copy_encode(code, data)
    rx = cw.copy()
    rx[0] ^= 0x55 & 0xE0  # flip bits 1,3 (0xA0)... keep reference's 3 flips:
    rx[0] = cw[0] ^ ((1 << 7) | (1 << 5) | (1 << 3))
    llrs = capi.hard_to_llrs(code, rx, dtype)
    ok, iters, out = capi.decode_ms(code, llrs, maxiters=50)
    assert ok and iters < 50
    np.testing.assert_array_equal(out[: code.n // 8], cw)


@pytest.mark.parametrize("name", FAST)
def test_decode_bf_three_bit_flips(name):
    code = get_code(name)
    rng = np.random.default_rng(6)
    data = rng.integers(0, 256, code.k // 8, dtype=np.uint8)
    cw = capi.copy_encode(code, data)
    rx = cw.copy()
    rx[0] = cw[0] ^ ((1 << 7) | (1 << 5) | (1 << 3))
    ok, iters, out = capi.decode_bf(code, rx, maxiters=50)
    assert ok
    np.testing.assert_array_equal(out[: code.n // 8], cw)


@pytest.mark.parametrize("name", ["TC128", "TC256"])
def test_decode_ms_bit_exact_vs_oracle(name):
    """The native decoder must match the NumPy oracle bit-for-bit (f32):
    same edge order, same update rules, same outputs and iteration counts,
    including non-converged cases."""
    code = get_code(name)
    rng = np.random.default_rng(9)
    for trial in range(4):
        data = rng.integers(0, 256, code.k // 8, dtype=np.uint8)
        cw = oracle.encode(code, data)
        tx = oracle.hard_to_llrs(code, cw, np.float32)
        noisy = (tx + rng.normal(0, 0.7, tx.shape)).astype(np.float32)
        ok_o, it_o, out_o = oracle.decode_ms(code, noisy, maxiters=12)
        ok_c, it_c, out_c = capi.decode_ms(code, noisy, maxiters=12)
        assert ok_o == ok_c and it_o == it_c
        np.testing.assert_array_equal(out_o, out_c)


def test_decode_ms_i8_bit_exact_vs_oracle():
    """Saturating i8 path parity with the oracle."""
    code = get_code("TC128")
    rng = np.random.default_rng(10)
    data = rng.integers(0, 256, code.k // 8, dtype=np.uint8)
    cw = oracle.encode(code, data)
    llrs = (oracle.hard_to_llrs(code, cw, np.float32) * 4).astype(np.int8)
    llrs[:5] = -llrs[:5]  # corrupt
    ok_o, it_o, out_o = oracle.decode_ms(code, llrs.astype(np.int8), maxiters=20)
    ok_c, it_c, out_c = capi.decode_ms(code, llrs.astype(np.int8), maxiters=20)
    assert ok_o == ok_c and it_o == it_c
    np.testing.assert_array_equal(out_o, out_c)


def test_decode_bf_bit_exact_vs_oracle_punctured():
    """BF+erasure path on a punctured (TM) code vs oracle."""
    code = get_code("TM1280")
    rng = np.random.default_rng(11)
    data = rng.integers(0, 256, code.k // 8, dtype=np.uint8)
    cw = oracle.encode(code, data)
    rx = cw.copy()
    rx[0] ^= (1 << 6) | (1 << 2)
    ok_o, it_o, out_o = oracle.decode_bf(code, rx, maxiters=30)
    ok_c, it_c, out_c = capi.decode_bf(code, rx, maxiters=30)
    assert ok_o == ok_c and it_o == it_c
    np.testing.assert_array_equal(out_o, out_c)


def test_converters_roundtrip():
    code = get_code("TC128")
    rng = np.random.default_rng(12)
    cw = rng.integers(0, 256, code.n // 8, dtype=np.uint8)
    for dt in (np.int8, np.int16, np.float32, np.float64):
        llrs = capi.hard_to_llrs(code, cw, dt)
        assert set(np.unique(llrs)) <= {-1, 1}
        np.testing.assert_array_equal(capi.llrs_to_hard(code, llrs), cw)
