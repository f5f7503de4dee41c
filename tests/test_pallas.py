"""Pallas fused QC min-sum decoder tests (interpreter mode on CPU).

The compiled Mosaic kernel is exercised on real TPU hardware by bench.py
and the verify drive; here the same kernel body runs under the Pallas
interpreter to pin its semantics against the XLA QC decoder bit-for-bit.
(The round-1 whole-decode kernel with batch-on-lanes layout was retired
after losing to XLA 48x on TC128 — docs/DESIGN.md section 6 records the
measurements; ops/pallas_qc.py is the design that won.)
"""

import jax.numpy as jnp
import numpy as np
import pytest

from labrador_ldpc_tpu.codes.params import get_code
from labrador_ldpc_tpu.ops.convert import hard_to_llrs, pack_bits
from labrador_ldpc_tpu.ops.encoder import encode_bits
from labrador_ldpc_tpu.ops.pallas_qc import make_ms_decoder_pallas_qc
from labrador_ldpc_tpu.ops.qc_minsum import make_ms_decoder_qc


@pytest.mark.parametrize("static_tables", [True, False],
                         ids=["static", "dynamic"])
def test_pallas_qc_matches_qc_xla_f32(static_tables):
    """f32: bit-identical (bits/success/iterations) to the XLA QC decoder,
    on a noisy batch that is NOT a tile multiple (exercises padding), for
    both the unrolled-static and SMEM-table kernel variants."""
    code = get_code("TM2048")
    B = 10
    rng = np.random.default_rng(11)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    tx = 1.0 - 2.0 * cw.astype(np.float32)
    noisy = jnp.asarray(tx + 0.5 * rng.standard_normal(tx.shape).astype(np.float32))
    r_p = make_ms_decoder_pallas_qc(code, jnp.float32, maxiters=12, batch_tile=4,
                                    interpret=True,
                                    static_tables=static_tables)(noisy)
    r_q = make_ms_decoder_qc(code, jnp.float32, maxiters=12)(noisy)
    np.testing.assert_array_equal(np.asarray(r_p.bits), np.asarray(r_q.bits))
    np.testing.assert_array_equal(np.asarray(r_p.success), np.asarray(r_q.success))
    np.testing.assert_array_equal(np.asarray(r_p.iterations),
                                  np.asarray(r_q.iterations))


@pytest.mark.parametrize("name", ["TM1280", "TM1536"])
def test_pallas_qc_small_m_matches_qc_xla(name):
    """M=128 (masked full-width rolls) and M=256 (64-lane quarter slices):
    bit-identical to the XLA QC decoder on a noisy batch. These are the
    sub-512 submatrix sizes enabled in round 2; the M=128 path exercises
    the _masked lane-select construction in _static_perm_fns."""
    code = get_code(name)
    B = 6
    rng = np.random.default_rng(23)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    tx = 1.0 - 2.0 * cw.astype(np.float32)
    noisy = jnp.asarray(tx + 0.5 * rng.standard_normal(tx.shape).astype(np.float32))
    r_p = make_ms_decoder_pallas_qc(code, jnp.float32, maxiters=12, batch_tile=2,
                                    interpret=True)(noisy)
    r_q = make_ms_decoder_qc(code, jnp.float32, maxiters=12)(noisy)
    np.testing.assert_array_equal(np.asarray(r_p.bits), np.asarray(r_q.bits))
    np.testing.assert_array_equal(np.asarray(r_p.success), np.asarray(r_q.success))
    np.testing.assert_array_equal(np.asarray(r_p.iterations),
                                  np.asarray(r_q.iterations))


@pytest.mark.parametrize("name", ["TM1280", "TM1536"])
def test_pallas_layered_small_m_matches_layered_xla(name):
    """Layered kernel on the sub-512 submatrix sizes: bit-identical to the
    XLA layered decoder (same accumulation order)."""
    from labrador_ldpc_tpu.ops.pallas_qc import make_ms_decoder_pallas_layered
    from labrador_ldpc_tpu.ops.qc_minsum import make_ms_decoder_layered

    code = get_code(name)
    B = 6
    rng = np.random.default_rng(29)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    tx = 1.0 - 2.0 * cw.astype(np.float32)
    noisy = jnp.asarray(tx + 0.5 * rng.standard_normal(tx.shape).astype(np.float32))
    r_p = make_ms_decoder_pallas_layered(code, jnp.float32, maxiters=12,
                                         batch_tile=2, interpret=True)(noisy)
    r_l = make_ms_decoder_layered(code, jnp.float32, maxiters=12)(noisy)
    np.testing.assert_array_equal(np.asarray(r_p.bits), np.asarray(r_l.bits))
    np.testing.assert_array_equal(np.asarray(r_p.success), np.asarray(r_l.success))
    np.testing.assert_array_equal(np.asarray(r_p.iterations),
                                  np.asarray(r_l.iterations))


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


def test_pallas_qc_multi_tile_early_exit():
    """Tiles exit independently: the clean tile converges at iteration 0."""
    code = get_code("TM2048")
    B, Bt = 8, 4
    rng = np.random.default_rng(19)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    rx = cw.copy()
    rx[: B // 2, [0, 3, 5]] ^= 1  # first tile corrupted, second clean
    llrs = hard_to_llrs(pack_bits(jnp.asarray(rx)), jnp.float32)
    res = make_ms_decoder_pallas_qc(code, jnp.float32, maxiters=50, batch_tile=Bt,
                                    interpret=True)(llrs)
    assert bool(np.asarray(res.success).all())
    np.testing.assert_array_equal(np.asarray(res.bits)[:, : code.n], cw)
    iters = np.asarray(res.iterations)
    # the clean tile's while_loop exits iterations earlier than the
    # corrupted tile's (per-tile early exit, not batch-global)
    assert iters[B // 2:].max() < iters[: B // 2].min()


def test_pallas_qc_rejects_bad_configs():
    with pytest.raises(ValueError):
        make_ms_decoder_pallas_qc("TM2048", jnp.int32)
    with pytest.raises(ValueError):  # int needs the static-tables kernel
        make_ms_decoder_pallas_qc("TM2048", jnp.int8, static_tables=False)
    with pytest.raises(ValueError):  # no alpha on the saturating path
        make_ms_decoder_pallas_qc("TM2048", jnp.int8, alpha=0.8)
    # TC codes no longer raise: M<128 dispatches to the transposed
    # sublane-roll kernel (ops/pallas_tc.py, tests/test_pallas_tc.py)


@pytest.mark.parametrize("dtype", [jnp.int8, jnp.int16], ids=["i8", "i16"])
def test_pallas_qc_int_matches_qc_int_xla(dtype):
    """Saturating int semantics: bit-identical (bits/success/iterations) to
    make_ms_decoder_qc_int — same accumulation order, saturation expressed
    as f32 clips (exact for integer magnitudes <= 32767)."""
    from labrador_ldpc_tpu.channel.awgn import default_llr_scale, quantize_llrs
    from labrador_ldpc_tpu.ops.qc_minsum import make_ms_decoder_qc_int

    code = get_code("TM2048")
    B = 10
    rng = np.random.default_rng(37)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    tx = 1.0 - 2.0 * cw.astype(np.float32)
    noisy = tx + 0.6 * rng.standard_normal(tx.shape).astype(np.float32)
    llrs = quantize_llrs(jnp.asarray(noisy), dtype, default_llr_scale(dtype))
    r_p = make_ms_decoder_pallas_qc(code, dtype, maxiters=12, batch_tile=4,
                                    interpret=True)(llrs)
    r_q = make_ms_decoder_qc_int(code, dtype, maxiters=12)(llrs)
    np.testing.assert_array_equal(np.asarray(r_p.bits), np.asarray(r_q.bits))
    np.testing.assert_array_equal(np.asarray(r_p.success), np.asarray(r_q.success))
    np.testing.assert_array_equal(np.asarray(r_p.iterations),
                                  np.asarray(r_q.iterations))


def test_pallas_qc_int8_small_m_matches_qc_int_xla():
    """Saturating int8 on the M=128 masked-roll path (TM1280): the masked
    lane-select permutations must compose with the f32-clip saturation
    semantics exactly as the slice form does."""
    from labrador_ldpc_tpu.channel.awgn import default_llr_scale, quantize_llrs
    from labrador_ldpc_tpu.ops.qc_minsum import make_ms_decoder_qc_int

    code = get_code("TM1280")
    B = 8
    rng = np.random.default_rng(43)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    tx = 1.0 - 2.0 * cw.astype(np.float32)
    noisy = tx + 0.5 * rng.standard_normal(tx.shape).astype(np.float32)
    llrs = quantize_llrs(jnp.asarray(noisy), jnp.int8, default_llr_scale(jnp.int8))
    r_p = make_ms_decoder_pallas_qc(code, jnp.int8, maxiters=12, batch_tile=4,
                                    interpret=True)(llrs)
    r_q = make_ms_decoder_qc_int(code, jnp.int8, maxiters=12)(llrs)
    np.testing.assert_array_equal(np.asarray(r_p.bits), np.asarray(r_q.bits))
    np.testing.assert_array_equal(np.asarray(r_p.success), np.asarray(r_q.success))
    np.testing.assert_array_equal(np.asarray(r_p.iterations),
                                  np.asarray(r_q.iterations))


def test_pallas_layered_int_three_bit_flips():
    """Layered int8: recovers the 3-bit-flip protocol with hard +/-1 LLRs
    scaled to the int range (no XLA layered-int twin exists; outcome-level
    validation plus the BER anchor suite)."""
    from labrador_ldpc_tpu.ops.pallas_qc import make_ms_decoder_pallas_layered

    code = get_code("TM2048")
    B = 8
    rng = np.random.default_rng(41)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    rx = cw.copy()
    rx[:, [0, 3, 5]] ^= 1
    llrs = np.where(np.asarray(rx) != 0, -16, 16).astype(np.int8)
    res = make_ms_decoder_pallas_layered(code, jnp.int8, maxiters=50,
                                         batch_tile=8, interpret=True)(
        jnp.asarray(llrs)
    )
    assert bool(np.asarray(res.success).all())
    np.testing.assert_array_equal(np.asarray(res.bits)[:, : code.n], cw)


def test_pallas_layered_matches_layered_xla_f32():
    """f32: bit-identical (bits/success/iterations) to the XLA layered
    decoder on a noisy batch with a non-tile-multiple batch size."""
    from labrador_ldpc_tpu.ops.pallas_qc import make_ms_decoder_pallas_layered
    from labrador_ldpc_tpu.ops.qc_minsum import make_ms_decoder_layered

    code = get_code("TM2048")
    B = 10
    rng = np.random.default_rng(23)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    tx = 1.0 - 2.0 * cw.astype(np.float32)
    noisy = jnp.asarray(tx + 0.55 * rng.standard_normal(tx.shape).astype(np.float32))
    r_p = make_ms_decoder_pallas_layered(code, jnp.float32, maxiters=12,
                                         batch_tile=4, interpret=True)(noisy)
    r_l = make_ms_decoder_layered(code, jnp.float32, maxiters=12)(noisy)
    np.testing.assert_array_equal(np.asarray(r_p.bits), np.asarray(r_l.bits))
    np.testing.assert_array_equal(np.asarray(r_p.success), np.asarray(r_l.success))
    np.testing.assert_array_equal(np.asarray(r_p.iterations),
                                  np.asarray(r_l.iterations))


def test_pallas_layered_three_bit_flips_and_failures():
    """Recovers the 3-bit-flip protocol; non-converged codewords report
    success=False with posterior-sign bits (heavy-noise lanes)."""
    from labrador_ldpc_tpu.ops.pallas_qc import make_ms_decoder_pallas_layered
    from labrador_ldpc_tpu.ops.qc_minsum import make_ms_decoder_layered

    code = get_code("TM2048")
    B = 8
    rng = np.random.default_rng(29)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    rx = cw.copy()
    rx[:, [0, 3, 5]] ^= 1
    llrs = hard_to_llrs(pack_bits(jnp.asarray(rx)), jnp.float32)
    res = make_ms_decoder_pallas_layered(code, jnp.float32, maxiters=50,
                                         batch_tile=8, interpret=True)(llrs)
    assert bool(np.asarray(res.success).all())
    np.testing.assert_array_equal(np.asarray(res.bits)[:, : code.n], cw)

    # pure noise: nothing converges; parity with XLA layered on failures
    noise = jnp.asarray(rng.standard_normal((B, code.n)).astype(np.float32))
    r_p = make_ms_decoder_pallas_layered(code, jnp.float32, maxiters=6,
                                         batch_tile=8, interpret=True)(noise)
    r_l = make_ms_decoder_layered(code, jnp.float32, maxiters=6)(noise)
    np.testing.assert_array_equal(np.asarray(r_p.success), np.asarray(r_l.success))
    np.testing.assert_array_equal(np.asarray(r_p.bits), np.asarray(r_l.bits))


def test_pallas_layered_alpha_matches_layered_xla():
    """Normalized min-sum (alpha) parity with the XLA layered decoder."""
    from labrador_ldpc_tpu.ops.pallas_qc import make_ms_decoder_pallas_layered
    from labrador_ldpc_tpu.ops.qc_minsum import make_ms_decoder_layered

    code = get_code("TM2048")
    B = 4
    rng = np.random.default_rng(31)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    tx = 1.0 - 2.0 * cw.astype(np.float32)
    noisy = jnp.asarray(tx + 0.5 * rng.standard_normal(tx.shape).astype(np.float32))
    r_p = make_ms_decoder_pallas_layered(code, jnp.float32, maxiters=10,
                                         alpha=0.8, batch_tile=4,
                                         interpret=True)(noisy)
    r_l = make_ms_decoder_layered(code, jnp.float32, maxiters=10, alpha=0.8)(noisy)
    np.testing.assert_array_equal(np.asarray(r_p.bits), np.asarray(r_l.bits))
    np.testing.assert_array_equal(np.asarray(r_p.iterations),
                                  np.asarray(r_l.iterations))


def test_pallas_qc_int8_saturation_corners():
    """Uniform random int8 LLRs spanning [-128, 127] hit every saturation
    point (add/sub clamps, |-128| -> 127); still bit-exact vs qc_int."""
    from labrador_ldpc_tpu.ops.qc_minsum import make_ms_decoder_qc_int

    code = get_code("TM2048")
    rng = np.random.default_rng(99)
    llrs = jnp.asarray(rng.integers(-128, 128, (8, code.n), dtype=np.int8))
    r_p = make_ms_decoder_pallas_qc(code, jnp.int8, maxiters=8, batch_tile=4,
                                    interpret=True)(llrs)
    r_q = make_ms_decoder_qc_int(code, jnp.int8, maxiters=8)(llrs)
    np.testing.assert_array_equal(np.asarray(r_p.bits), np.asarray(r_q.bits))
    np.testing.assert_array_equal(np.asarray(r_p.success), np.asarray(r_q.success))
    np.testing.assert_array_equal(np.asarray(r_p.iterations),
                                  np.asarray(r_q.iterations))


@pytest.mark.parametrize("dtype", [jnp.int8, jnp.int16], ids=["i8", "i16"])
def test_pallas_layered_int_matches_layered_int_xla(dtype):
    """Saturating int layered semantics: bit-identical
    (bits/success/iterations) to the XLA layered int twin
    (make_ms_decoder_layered with an int dtype), which mirrors the kernel's
    exact clip placement. A misplaced clip in either implementation breaks
    this mid-waterfall."""
    from labrador_ldpc_tpu.channel.awgn import default_llr_scale, quantize_llrs
    from labrador_ldpc_tpu.ops.pallas_qc import make_ms_decoder_pallas_layered
    from labrador_ldpc_tpu.ops.qc_minsum import make_ms_decoder_layered

    code = get_code("TM2048")
    B = 10
    rng = np.random.default_rng(61)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    tx = 1.0 - 2.0 * cw.astype(np.float32)
    noisy = tx + 0.6 * rng.standard_normal(tx.shape).astype(np.float32)
    llrs = quantize_llrs(jnp.asarray(noisy), dtype, default_llr_scale(dtype))
    r_p = make_ms_decoder_pallas_layered(code, dtype, maxiters=12, batch_tile=4,
                                         interpret=True)(llrs)
    r_l = make_ms_decoder_layered(code, dtype, maxiters=12)(llrs)
    np.testing.assert_array_equal(np.asarray(r_p.bits), np.asarray(r_l.bits))
    np.testing.assert_array_equal(np.asarray(r_p.success), np.asarray(r_l.success))
    np.testing.assert_array_equal(np.asarray(r_p.iterations),
                                  np.asarray(r_l.iterations))


def test_pallas_layered_int8_small_m_matches_layered_int_xla():
    """Layered int8 on the M=128 masked-roll path (TM1280): the masked
    lane-select permutations must compose with the saturating clip sequence
    exactly as the slice form does."""
    from labrador_ldpc_tpu.channel.awgn import default_llr_scale, quantize_llrs
    from labrador_ldpc_tpu.ops.pallas_qc import make_ms_decoder_pallas_layered
    from labrador_ldpc_tpu.ops.qc_minsum import make_ms_decoder_layered

    code = get_code("TM1280")
    B = 8
    rng = np.random.default_rng(67)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    tx = 1.0 - 2.0 * cw.astype(np.float32)
    noisy = tx + 0.55 * rng.standard_normal(tx.shape).astype(np.float32)
    llrs = quantize_llrs(jnp.asarray(noisy), jnp.int8, default_llr_scale(jnp.int8))
    r_p = make_ms_decoder_pallas_layered(code, jnp.int8, maxiters=12, batch_tile=4,
                                         interpret=True)(llrs)
    r_l = make_ms_decoder_layered(code, jnp.int8, maxiters=12)(llrs)
    np.testing.assert_array_equal(np.asarray(r_p.bits), np.asarray(r_l.bits))
    np.testing.assert_array_equal(np.asarray(r_p.success), np.asarray(r_l.success))
    np.testing.assert_array_equal(np.asarray(r_p.iterations),
                                  np.asarray(r_l.iterations))


def test_pallas_layered_int8_saturation_corners():
    """Uniform random int8 LLRs spanning [-128, 127] hit the layered
    schedule's saturation points; still bit-exact vs the XLA layered int
    twin.

    Falsification audit (round 3): this pin FAILS if the kernel
    reintroduces a clipped posterior accumulator (the semantically
    significant clip-placement bug — verified by deliberate injection).
    Two corners are unobservable at the output level and documented
    instead: (a) the kernel's extrinsic clip is redundant given the
    saturating abs + sign-only uses (the twin's clip is load-bearing for
    its int8 `tps` store, which would wrap without it); (b) dropping ONLY
    the abs saturation (|-128| -> 128 instead of 127) is a +-1-LSB,
    sign-preserving magnitude change that 40 adversarial heavy-tail seeds
    could not convert into a bits/iterations difference — both
    implementations saturate identically by construction."""
    from labrador_ldpc_tpu.ops.pallas_qc import make_ms_decoder_pallas_layered
    from labrador_ldpc_tpu.ops.qc_minsum import make_ms_decoder_layered

    code = get_code("TM2048")
    rng = np.random.default_rng(71)
    llrs = jnp.asarray(rng.integers(-128, 128, (8, code.n), dtype=np.int8))
    r_p = make_ms_decoder_pallas_layered(code, jnp.int8, maxiters=8, batch_tile=4,
                                         interpret=True)(llrs)
    r_l = make_ms_decoder_layered(code, jnp.int8, maxiters=8)(llrs)
    np.testing.assert_array_equal(np.asarray(r_p.bits), np.asarray(r_l.bits))
    np.testing.assert_array_equal(np.asarray(r_p.success), np.asarray(r_l.success))
    np.testing.assert_array_equal(np.asarray(r_p.iterations),
                                  np.asarray(r_l.iterations))


def test_pallas_layered_subtiles_bit_exact():
    """subtiles=S (the VERDICT r4 item 1 grid-step experiment knob): S
    sequential sub-tiles per grid step with scratch reused — must be
    bit-exact vs S=1 (bits/success/iterations), including the padding
    path when batch is not a multiple of S*batch_tile."""
    from labrador_ldpc_tpu.ops.pallas_qc import make_ms_decoder_pallas_layered

    code = get_code("TM2048")
    rng = np.random.default_rng(7)
    B = 8
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    bits = np.asarray(encode_bits(code, jnp.asarray(data)))
    tx = 1.0 - 2.0 * bits.astype(np.float64)
    soft = (tx + rng.normal(0.0, 0.8, tx.shape)).astype(np.float32)
    r1 = make_ms_decoder_pallas_layered(
        code, jnp.float32, maxiters=8, batch_tile=2, interpret=True
    )(jnp.asarray(soft))
    for S in (2, 4):
        rS = make_ms_decoder_pallas_layered(
            code, jnp.float32, maxiters=8, batch_tile=2, interpret=True,
            subtiles=S,
        )(jnp.asarray(soft))
        np.testing.assert_array_equal(np.asarray(r1.bits), np.asarray(rS.bits))
        np.testing.assert_array_equal(
            np.asarray(r1.success), np.asarray(rS.success)
        )
        np.testing.assert_array_equal(
            np.asarray(r1.iterations), np.asarray(rS.iterations)
        )
    # padding: 6 rows through an S*bt=4-row grid block
    r3 = make_ms_decoder_pallas_layered(
        code, jnp.float32, maxiters=8, batch_tile=2, interpret=True, subtiles=2
    )(jnp.asarray(soft[:6]))
    np.testing.assert_array_equal(np.asarray(r1.bits)[:6], np.asarray(r3.bits))


def test_pallas_layered_recompute_u_bit_exact():
    """recompute_u=True (round-5 falsified-but-kept variant: per-edge u
    planes replaced by 3 per-layer stat planes, u recomputed from t')
    must be bit-exact vs the stored-u kernel — bits/success/iterations —
    for f32, bf16 (storage round replay) and the saturating int path, on
    both the lane-parts (TM2048) and full-plane (TM8192) kernel forms."""
    import numpy as np

    from labrador_ldpc_tpu.channel.awgn import quantize_llrs
    from labrador_ldpc_tpu.ops.pallas_qc import make_ms_decoder_pallas_layered

    for name in ("TM2048", "TM8192"):
        code = get_code(name)
        rng = np.random.default_rng(7)
        B = 4
        data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
        cw = np.asarray(encode_bits(code, jnp.asarray(data)))
        tx = 1.0 - 2.0 * cw.astype(np.float64)
        soft = (tx + rng.normal(0.0, 0.8, tx.shape)).astype(np.float32)
        for dt, llrs in [
            (jnp.float32, jnp.asarray(soft)),
            (jnp.bfloat16, jnp.asarray(soft)),
            (jnp.int8, quantize_llrs(jnp.asarray(soft), jnp.int8, 16.0)),
        ]:
            r0 = make_ms_decoder_pallas_layered(
                code, dt, maxiters=7, batch_tile=2, interpret=True,
                recompute_u=False,
            )(llrs)
            r1 = make_ms_decoder_pallas_layered(
                code, dt, maxiters=7, batch_tile=2, interpret=True,
                recompute_u=True,
            )(llrs)
            np.testing.assert_array_equal(
                np.asarray(r0.bits), np.asarray(r1.bits)
            )
            np.testing.assert_array_equal(
                np.asarray(r0.success), np.asarray(r1.success)
            )
            np.testing.assert_array_equal(
                np.asarray(r0.iterations), np.asarray(r1.iterations)
            )
