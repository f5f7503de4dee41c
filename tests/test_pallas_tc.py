"""Transposed (node-major) Pallas min-sum kernels for the small-M TC codes
(interpreter mode on CPU; compiled Mosaic is exercised on real TPU by the
bench sweep / verify drive).

ops/pallas_tc.py puts nodes on SUBLANES and the batch on LANES so every TC
block permutation is a static sublane roll; semantics are pinned here
bit-for-bit against the XLA QC decoders, same contract as test_pallas.py
pins for the TM kernels.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from labrador_ldpc_tpu.codes.params import get_code
from labrador_ldpc_tpu.ops.encoder import encode_bits
from labrador_ldpc_tpu.ops.pallas_qc import (
    make_ms_decoder_pallas_layered,
    make_ms_decoder_pallas_qc,
)
from labrador_ldpc_tpu.ops.pallas_tc import (
    make_ms_decoder_pallas_tc_layered,
    make_ms_decoder_pallas_tc_qc,
)
from labrador_ldpc_tpu.ops.qc_minsum import (
    make_ms_decoder_layered,
    make_ms_decoder_qc,
    make_ms_decoder_qc_int,
)

TC_CODES = ["TC128", "TC256", "TC512"]


def _noisy(code, B, seed, sigma=0.55):
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    tx = 1.0 - 2.0 * cw.astype(np.float32)
    return jnp.asarray(tx + sigma * rng.standard_normal(tx.shape).astype(np.float32))


def _assert_same(r_p, r_q):
    np.testing.assert_array_equal(np.asarray(r_p.bits), np.asarray(r_q.bits))
    np.testing.assert_array_equal(np.asarray(r_p.success), np.asarray(r_q.success))
    np.testing.assert_array_equal(
        np.asarray(r_p.iterations), np.asarray(r_q.iterations)
    )


@pytest.mark.parametrize("name", TC_CODES)
def test_pallas_tc_layered_matches_layered_xla_f32(name):
    """f32: bit-identical (bits/success/iterations) to the XLA layered
    decoder on a noisy batch that is NOT a tile multiple (pads lanes)."""
    code = get_code(name)
    noisy = _noisy(code, 10, 101)
    r_p = make_ms_decoder_pallas_tc_layered(
        code, jnp.float32, maxiters=12, batch_tile=4, interpret=True
    )(noisy)
    r_q = make_ms_decoder_layered(code, jnp.float32, maxiters=12)(noisy)
    _assert_same(r_p, r_q)


@pytest.mark.parametrize("name", TC_CODES)
def test_pallas_tc_qc_matches_qc_xla_f32(name):
    """Flooding schedule: bit-identical to the XLA QC decoder (which is the
    reference's own schedule, decoder.rs:347-475)."""
    code = get_code(name)
    noisy = _noisy(code, 10, 202)
    r_p = make_ms_decoder_pallas_tc_qc(
        code, jnp.float32, maxiters=12, batch_tile=4, interpret=True
    )(noisy)
    r_q = make_ms_decoder_qc(code, jnp.float32, maxiters=12)(noisy)
    _assert_same(r_p, r_q)


@pytest.mark.parametrize("dtype", [jnp.int8, jnp.int16], ids=["i8", "i16"])
def test_pallas_tc_qc_int_matches_qc_int_xla(dtype):
    """Saturating int semantics (f32-clip formulation): bit-identical to
    make_ms_decoder_qc_int on quantized LLRs."""
    from labrador_ldpc_tpu.channel.awgn import default_llr_scale, quantize_llrs

    code = get_code("TC256")
    noisy = _noisy(code, 10, 303)
    llrs = quantize_llrs(noisy, dtype, default_llr_scale(dtype))
    r_p = make_ms_decoder_pallas_tc_qc(
        code, dtype, maxiters=12, batch_tile=4, interpret=True
    )(llrs)
    r_q = make_ms_decoder_qc_int(code, dtype, maxiters=12)(llrs)
    _assert_same(r_p, r_q)


def test_pallas_tc_int8_saturation_points():
    """Uniform random int8 LLRs spanning [-128, 127] hit every saturation
    point (add/sub clamps, |-128| -> 127); still bit-exact vs qc_int."""
    code = get_code("TC128")
    rng = np.random.default_rng(47)
    llrs = jnp.asarray(rng.integers(-128, 128, (8, code.n), dtype=np.int8))
    r_p = make_ms_decoder_pallas_tc_qc(
        code, jnp.int8, maxiters=10, batch_tile=4, interpret=True
    )(llrs)
    r_q = make_ms_decoder_qc_int(code, jnp.int8, maxiters=10)(llrs)
    _assert_same(r_p, r_q)


@pytest.mark.parametrize("dtype", [jnp.int8, jnp.int16], ids=["i8", "i16"])
def test_pallas_tc_layered_int_matches_layered_int_xla(dtype):
    """Saturating int layered semantics: bit-identical to the XLA layered
    int twin (make_ms_decoder_layered with an int dtype), which mirrors the
    kernel's exact clip placement."""
    from labrador_ldpc_tpu.channel.awgn import default_llr_scale, quantize_llrs

    code = get_code("TC512")
    noisy = _noisy(code, 10, 53, sigma=0.6)
    llrs = quantize_llrs(noisy, dtype, default_llr_scale(dtype))
    r_p = make_ms_decoder_pallas_tc_layered(
        code, dtype, maxiters=12, batch_tile=4, interpret=True
    )(llrs)
    r_l = make_ms_decoder_layered(code, dtype, maxiters=12)(llrs)
    _assert_same(r_p, r_l)


def test_pallas_tc_layered_int8_saturation_points():
    """Uniform random int8 LLRs spanning [-128, 127] hit every layered
    saturation point; still bit-exact vs the XLA layered int twin."""
    code = get_code("TC128")
    rng = np.random.default_rng(59)
    llrs = jnp.asarray(rng.integers(-128, 128, (8, code.n), dtype=np.int8))
    r_p = make_ms_decoder_pallas_tc_layered(
        code, jnp.int8, maxiters=10, batch_tile=4, interpret=True
    )(llrs)
    r_l = make_ms_decoder_layered(code, jnp.int8, maxiters=10)(llrs)
    _assert_same(r_p, r_l)


@pytest.mark.parametrize("name", TC_CODES)
def test_dispatch_from_pallas_qc_factories(name):
    """make_ms_decoder_pallas_qc / _layered auto-route M<128 codes here, so
    the caller-facing factories cover all 9 codes with one contract."""
    code = get_code(name)
    noisy = _noisy(code, 6, 404)
    r_d = make_ms_decoder_pallas_layered(
        code, jnp.float32, maxiters=10, batch_tile=2, interpret=True
    )(noisy)
    r_q = make_ms_decoder_layered(code, jnp.float32, maxiters=10)(noisy)
    _assert_same(r_d, r_q)
    r_d = make_ms_decoder_pallas_qc(
        code, jnp.float32, maxiters=10, batch_tile=2, interpret=True
    )(noisy)
    r_q = make_ms_decoder_qc(code, jnp.float32, maxiters=10)(noisy)
    _assert_same(r_d, r_q)


TM_PI_CODES = ["TM1280", "TM1536"]  # M = 128 / 256: node-major pi perms


@pytest.mark.parametrize("name", TM_PI_CODES)
def test_pallas_tc_pi_layered_matches_layered_xla_f32(name):
    """M=128/256 TM codes in the node-major layout: planes are carried as
    four quarter PARTS closed under every pi permutation (_part_layout /
    _part_fns — a pi perm is a part reindex plus per-part static sublane
    rolls; no concats, no slicing of computed values). Bit-exact vs the
    XLA layered decoder, including the punctured tail."""
    code = get_code(name)
    noisy = _noisy(code, 6, 607, sigma=0.6)
    r_p = make_ms_decoder_pallas_tc_layered(
        code, jnp.float32, maxiters=8, batch_tile=2, interpret=True
    )(noisy)
    r_q = make_ms_decoder_layered(code, jnp.float32, maxiters=8)(noisy)
    _assert_same(r_p, r_q)


@pytest.mark.parametrize("name", TM_PI_CODES)
def test_pallas_tc_pi_flooding_matches_qc_xla_f32(name):
    code = get_code(name)
    noisy = _noisy(code, 6, 709, sigma=0.6)
    r_p = make_ms_decoder_pallas_tc_qc(
        code, jnp.float32, maxiters=8, batch_tile=2, interpret=True
    )(noisy)
    r_q = make_ms_decoder_qc(code, jnp.float32, maxiters=8)(noisy)
    _assert_same(r_p, r_q)


def test_pallas_tc_pi_layered_int8_matches_twin():
    """Saturating int semantics on the node-major pi path: bit-exact vs
    the XLA layered int twin (wide-accumulator contract, CLAUDE.md)."""
    from labrador_ldpc_tpu.channel.awgn import default_llr_scale, quantize_llrs

    code = get_code("TM1280")
    noisy = _noisy(code, 6, 811, sigma=0.6)
    llrs = quantize_llrs(noisy, jnp.int8, default_llr_scale(jnp.int8))
    r_p = make_ms_decoder_pallas_tc_layered(
        code, jnp.int8, maxiters=8, batch_tile=2, interpret=True
    )(llrs)
    r_l = make_ms_decoder_layered(code, jnp.int8, maxiters=8)(llrs)
    _assert_same(r_p, r_l)


def test_pallas_tc_rejects_bad_configs():
    with pytest.raises(ValueError):
        make_ms_decoder_pallas_tc_qc("TC128", jnp.int32)
    with pytest.raises(ValueError):  # no alpha on the saturating path
        make_ms_decoder_pallas_tc_layered("TC128", jnp.int8, alpha=0.8)
    with pytest.raises(ValueError):  # batch on lanes: compiled tiles %128
        make_ms_decoder_pallas_tc_qc("TC128", jnp.float32, batch_tile=96)


def test_pallas_tc_pi_large_m_layered_matches_twin():
    """The quartered node-major path is open to EVERY TM code (all rot
    blocks are identity, _part_layout); pin the largest-M case TM2048
    (M=512, q=128) bit-exact vs the XLA layered twin."""
    code = get_code("TM2048")
    noisy = _noisy(code, 4, 913, sigma=0.6)
    r_p = make_ms_decoder_pallas_tc_layered(
        code, jnp.float32, maxiters=6, batch_tile=2, interpret=True
    )(noisy)
    r_q = make_ms_decoder_layered(code, jnp.float32, maxiters=6)(noisy)
    _assert_same(r_p, r_q)
