"""Channel harness tests: noise models, trial step counters, waterfall runner."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from labrador_ldpc_tpu.channel import make_trial_step, noise_sigma, waterfall
from labrador_ldpc_tpu.codes.params import get_code


def test_noise_sigma_models():
    # perftest model: sigma = 10^(-snr/10) (perftest/src/main.rs:15)
    assert noise_sigma(0.0) == pytest.approx(1.0)
    assert noise_sigma(10.0) == pytest.approx(0.1)
    # physical Eb/N0 model for rate-1/2: sigma^2 = 1/(2*R*10^(x/10))
    c = get_code("TC128")
    assert noise_sigma(0.0, c, "ebn0") == pytest.approx(1.0)
    with pytest.raises(ValueError):
        noise_sigma(1.0, c, "nope")


def test_trial_step_counts():
    c = get_code("TC128")
    step = make_trial_step(c, batch=32, maxiters=20)
    stats = step(jax.random.PRNGKey(0), jnp.float32(0.01))
    assert int(stats.trials) == 32 and int(stats.bit_errors) == 0


def test_waterfall_runner_small():
    out = io.StringIO()
    pts = waterfall(
        "TC128",
        snrs_db=[2.0],
        batch=64,
        maxiters=20,
        max_bits=64 * 64 * 2,  # two batches
        max_bit_errors=10**9,
        csv_out=out,
        seed=3,
    )
    assert len(pts) == 1
    p = pts[0]
    assert p.trials == 128 and p.bits == 128 * 64
    line = out.getvalue().strip()
    assert line.startswith("TC128,2.0,128,8192,")
    # BER at 2 dB (sigma=0.63) should be well below raw channel error rate
    raw_ber = 0.056  # Q(1/0.63)
    assert p.ber < raw_ber


def test_two_stage_decoder_rescues():
    """Stage-2 flooding rescue re-decodes only the failed frames."""
    from labrador_ldpc_tpu.channel import make_two_stage_decoder
    from labrador_ldpc_tpu.ops.encoder import encode_bits

    c = get_code("TC128")
    B = 64
    rng = np.random.default_rng(23)
    data = rng.integers(0, 2, (B, c.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(c, jnp.asarray(data)))
    tx = 1.0 - 2.0 * cw.astype(np.float32)
    # noisy enough that the 2-iteration fast pass fails on some frames
    noisy = jnp.asarray(tx + 0.55 * rng.standard_normal(tx.shape).astype(np.float32))
    dec = make_two_stage_decoder(c, maxiters_fast=2, maxiters_rescue=50)
    res = dec(noisy)
    from labrador_ldpc_tpu.ops.qc_minsum import make_ms_decoder_layered

    fast_only = make_ms_decoder_layered(c, jnp.bfloat16, 2)(noisy)
    assert int(np.asarray(res.success).sum()) >= int(np.asarray(fast_only.success).sum())
    # every success is a valid codeword on the data bits we know
    ok = np.asarray(res.success)
    good = (np.asarray(res.bits)[:, : c.k] == data).all(axis=1)
    assert (good[ok].mean() if ok.any() else 1.0) > 0.9

    # impl plumbing: explicit stage impls route through the shared
    # _make_decoder registry (on TPU the production pairing is
    # fast_impl="pallas_layered", rescue_impl="pallas_qc")
    dec2 = make_two_stage_decoder(
        c, maxiters_fast=2, maxiters_rescue=50,
        dtype=jnp.float32, fast_impl="layered", rescue_impl="ref",
    )
    res2 = dec2(noisy)
    ok2 = np.asarray(res2.success)
    good2 = (np.asarray(res2.bits)[:, : c.k] == data).all(axis=1)
    assert ok2.any() and good2[ok2].mean() > 0.9

    # rescue_impl="sp" (the round-5 QUALITY mode): plumbs through the
    # registry; feed TRUE LLRs (scale once — min-sum stages are
    # scale-invariant, BP is not). Quality only pays on the large codes
    # (measured TM8192@1.1: 12 vs 175 FE/4096 — sum-product quality;
    # on short-cycle TC codes SCMS beats BP, sp_ms_gap.csv) — this
    # checks the plumbing, not quality.
    dec3 = make_two_stage_decoder(
        c, maxiters_fast=2, maxiters_rescue=50,
        dtype=jnp.float32, fast_impl="layered", rescue_impl="sp",
    )
    res3 = dec3(noisy * (2.0 / 0.55**2))
    ok3 = np.asarray(res3.success)
    good3 = (np.asarray(res3.bits)[:, : c.k] == data).all(axis=1)
    assert ok3.any() and good3[ok3].mean() > 0.9


def test_quantize_llrs_values():
    """clip(round(llr*scale)) semantics + default scales (VERDICT r1 item 3)."""
    from labrador_ldpc_tpu.channel import default_llr_scale, quantize_llrs

    assert default_llr_scale(jnp.int8) == 16.0
    assert default_llr_scale(jnp.int16) == 256.0
    x = jnp.array([[-20.0, -1.2, -0.04, 0.0, 0.6, 20.0]])
    q8 = np.asarray(quantize_llrs(x, jnp.int8))
    assert q8.dtype == np.int8
    assert q8.tolist() == [[-128, -19, -1, 0, 10, 127]]
    q16 = np.asarray(quantize_llrs(x, jnp.int16))
    assert q16.dtype == np.int16
    assert q16.tolist() == [[-5120, -307, -10, 0, 154, 5120]]
    # explicit scale overrides the default
    assert np.asarray(quantize_llrs(x, jnp.int8, scale=1.0)).tolist() == [
        [-20, -1, 0, 0, 1, 20]
    ]


@pytest.mark.parametrize("dtype,impl", [("int8", "qc"), ("int16", "qc"), ("int8", "qc_i8"), ("int16", "qc_i16")])
def test_int_llr_trial_step_soft_decoding(dtype, impl):
    """The quantized int channel path must behave like a SOFT decoder: at a
    moderate SNR where hard-truncated ±1 LLRs would leave many errors, the
    quantized path decodes nearly everything (reference decoder.rs:42-55
    treats int LLRs as first-class)."""
    c = get_code("TC128")
    step = make_trial_step(c, 64, 50, dtype, None, impl)
    sigma = noise_sigma(1.5)  # 0.708 — waterfall region for TC128
    stats = step(jax.random.PRNGKey(5), jnp.float32(sigma))
    assert int(stats.trials) == 64
    # raw channel BER at sigma=0.708 is ~7.9e-2 (so virtually every frame
    # would be wrong without decoding); the quantized path must decode most
    # frames. At this batch the BER estimate is dominated by a handful of
    # frame errors (f32 itself shows 3/64 at this seed), so gate on a 4x
    # margin; the precise i8-vs-f32 gap (~0.1-0.2 dB) is measured by the
    # stored waterfall curves in benchmarks/results/.
    ber = int(stats.bit_errors) / (64 * c.k)
    assert ber < 7.9e-2 / 4, f"int path is not decoding softly (ber={ber})"
    assert int(stats.frame_errors) <= 8


def test_int_trial_step_rejects_bad_combos():
    from labrador_ldpc_tpu.channel.awgn import _make_decoder

    with pytest.raises(ValueError, match="qc_i8"):
        _make_decoder(get_code("TC128"), jnp.float32, 10, None, "qc_i8")
    # layered + int8 is now a first-class saturating path (the XLA twin of
    # the Pallas layered int kernel) — it must NOT raise, but alpha must
    with pytest.raises(ValueError, match="alpha"):
        _make_decoder(get_code("TC128"), jnp.int8, 10, 0.8, "layered")
    with pytest.raises(ValueError, match="int32"):
        _make_decoder(get_code("TC128"), jnp.int32, 10, None, "layered")
    with pytest.raises(ValueError, match="alpha"):
        _make_decoder(get_code("TC128"), jnp.int8, 10, 0.8, "qc")
    with pytest.raises(ValueError, match="int32"):
        _make_decoder(get_code("TC128"), jnp.int32, 10, None, "qc")


def test_auto_impl_routing():
    """impl='auto' resolves to the measured-best path for the build-time
    backend: on this CPU backend that is the XLA layered decoder for
    f32/bf16/int8/int16 and reference-order for int32 (on TPU it resolves
    to the fused Pallas kernels — flooding for TM1280, layered otherwise;
    exercised by the bench/parity sessions)."""
    from labrador_ldpc_tpu.channel import quantize_llrs
    from labrador_ldpc_tpu.channel.awgn import _make_decoder
    from labrador_ldpc_tpu.ops.encoder import encode_bits
    from labrador_ldpc_tpu.ops.qc_minsum import make_ms_decoder_layered

    c = get_code("TC128")
    rng = np.random.default_rng(31)
    data = rng.integers(0, 2, (8, c.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(c, jnp.asarray(data)))
    tx = 1.0 - 2.0 * cw.astype(np.float32)
    noisy = jnp.asarray(tx + 0.5 * rng.standard_normal(tx.shape).astype(np.float32))

    r_auto = _make_decoder(c, jnp.float32, 20, None, "auto")(noisy)
    r_lay = make_ms_decoder_layered(c, jnp.float32, 20)(noisy)
    assert np.array_equal(np.asarray(r_auto.bits), np.asarray(r_lay.bits))
    assert np.array_equal(np.asarray(r_auto.iterations), np.asarray(r_lay.iterations))

    lq = quantize_llrs(noisy, jnp.int8)
    r_i = _make_decoder(c, jnp.int8, 20, None, "auto")(lq)
    r_il = make_ms_decoder_layered(c, jnp.int8, 20)(lq)
    assert np.array_equal(np.asarray(r_i.bits), np.asarray(r_il.bits))

    # int32 falls back to the reference-order path (the only int32 impl)
    r32 = _make_decoder(c, jnp.int32, 10, None, "auto")(lq.astype(jnp.int32))
    assert r32.bits.shape[1] >= c.n


def test_resolve_impl_routing_table():
    """Pin the production routing table (VERDICT r3 item 1): 'auto' is the
    default everywhere and must resolve to the measured-best path per
    backend. The TPU rows are pinned via the explicit backend= arg so the
    table is testable off-TPU; live-TPU behavior is exercised by the
    bench/parity sessions."""
    from labrador_ldpc_tpu.channel.awgn import resolve_impl

    # TPU: the fused Pallas layered kernels for every code — the round-4
    # quartered node-major path removed the TM1280 flooding exception
    # (nm layered 4.25M > nm flooding 3.88M > old lane-major best 2.07M)
    assert resolve_impl("TM8192", "float32", "auto", backend="tpu") == "pallas_layered"
    assert resolve_impl("TM1280", "bfloat16", "auto", backend="tpu") == "pallas_layered"
    assert resolve_impl("TM1280", "float32", "auto", backend="tpu") == "pallas_layered"
    assert resolve_impl("TC512", "int8", "auto", backend="tpu") == "pallas_layered"
    assert resolve_impl("TM2048", "int16", "auto", backend="tpu") == "pallas_layered"
    # Mosaic takes neither f64 nor int32: XLA layered / reference-order
    assert resolve_impl("TM8192", "float64", "auto", backend="tpu") == "layered"
    assert resolve_impl("TM8192", "int32", "auto", backend="tpu") == "ref"
    # off-TPU: XLA layered, reference-order for int32
    assert resolve_impl("TM8192", "float32", "auto", backend="cpu") == "layered"
    assert resolve_impl("TC128", "int32", "auto", backend="cpu") == "ref"
    # concrete names pass through untouched (callers key caches and the
    # shard_map decision on the resolved name)
    assert resolve_impl("TC128", "float32", "qc", backend="tpu") == "qc"
    assert resolve_impl("TM1280", "float32", "pallas_layered", backend="tpu") == "pallas_layered"


def test_resolve_impl_emits_no_warnings():
    """The round-3 bf16 guidance for TM1280/TM1536 is retired: it
    described the lane-major masked-roll kernels; the quartered node-major
    kernels are faster in f32 (4.25M/3.67M vs bf16 3.89M/3.30M cw/s), so
    'auto' routing must be silent everywhere."""
    import warnings

    from labrador_ldpc_tpu.channel.awgn import resolve_impl

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        for name in ("TM1280", "TM1536", "TM8192", "TC128"):
            for dt in ("float32", "bfloat16", "int8"):
                resolve_impl(name, dt, "auto", backend="tpu")
                resolve_impl(name, dt, "auto", backend="cpu")
    assert not rec


def test_cli_validates_impl_dtype():
    from labrador_ldpc_tpu.__main__ import main

    with pytest.raises(SystemExit):
        main(["waterfall", "--impl", "qc_i8", "--dtype", "float32", "--snrs", "2.0"])
    with pytest.raises(SystemExit):
        main(["waterfall", "--impl", "layered", "--dtype", "int32", "--snrs", "2.0"])


def test_waterfall_checkpoint_resume(tmp_path):
    """Partial-count persistence: a sweep resumed from a truncated
    checkpoint (simulated interruption mid-point) reproduces the
    uninterrupted run's counters exactly (SURVEY.md §5 checkpoint item)."""
    kw = dict(
        batch=64,
        maxiters=20,
        max_bits=64 * 64 * 3,  # three batches per point
        max_bit_errors=10**9,
        seed=5,
        pipeline_depth=2,
    )
    ref = waterfall("TC128", snrs_db=[2.0, 2.5], **kw)

    ck = tmp_path / "sweep.ckpt"
    waterfall("TC128", snrs_db=[2.0, 2.5], checkpoint=str(ck), **kw)
    lines = ck.read_text().splitlines()
    # config + (3 partial + 1 done) per point
    assert len(lines) == 1 + 2 * 4
    # "interrupt" mid-way through the second point: keep config, the whole
    # first point, and one drained batch of the second
    ck.write_text("\n".join(lines[:6]) + "\n")
    resumed = waterfall("TC128", snrs_db=[2.0, 2.5], checkpoint=str(ck), **kw)
    for a, b in zip(ref, resumed):
        assert (a.trials, a.bits, a.bit_errors, a.frame_errors, a.iterations) == (
            b.trials,
            b.bits,
            b.bit_errors,
            b.frame_errors,
            b.iterations,
        )
    # a second resume sees both points done and recomputes nothing
    again = waterfall("TC128", snrs_db=[2.0, 2.5], checkpoint=str(ck), **kw)
    assert [p.trials for p in again] == [p.trials for p in ref]

    # mismatched parameters must be refused, not silently merged
    import pytest as _pytest

    with _pytest.raises(ValueError, match="different"):
        waterfall("TC128", snrs_db=[2.0], checkpoint=str(ck),
                  **{**kw, "maxiters": 10})


# ---------------------------------------------------------------------------
# hard-decision channel for the bit-flip surface (channel/hard.py,
# VERDICT r4 item 2: the reference's documented BF-vs-MS tradeoff,
# src/lib.rs:165-172, finally has a statistical harness)


def test_bf_trial_step_bsc_counts():
    from labrador_ldpc_tpu.channel.hard import make_bf_trial_step

    step = make_bf_trial_step("TC512", batch=64, maxiters=30, channel="bsc",
                              impl="qc")
    key = jax.random.PRNGKey(3)
    # p = 0: a clean channel must decode everything with zero errors
    s0 = step(key, jnp.float32(0.0))
    assert int(s0.trials) == 64
    assert int(s0.bit_errors) == 0 and int(s0.frame_errors) == 0
    assert int(s0.decode_failures) == 0
    # heavy flips: errors must appear and counters stay consistent
    s1 = step(key, jnp.float32(0.05))
    assert int(s1.frame_errors) > 0
    assert int(s1.bit_errors) >= int(s1.frame_errors)
    assert 0 <= int(s1.decode_failures) <= 64


def test_bf_waterfall_bsc_monotone_and_seeded():
    """FER grows with p; the run is seed-deterministic."""
    kw = dict(batch=128, maxiters=30, max_bits=128 * 256 * 2,
              max_bit_errors=10**9, noise_model="bsc", decoder="bf", seed=5)
    a = waterfall("TC512", [0.01, 0.04], **kw)
    b = waterfall("TC512", [0.01, 0.04], **kw)
    assert [(p.trials, p.bit_errors, p.frame_errors) for p in a] == [
        (p.trials, p.bit_errors, p.frame_errors) for p in b
    ]
    assert a[0].frame_errors <= a[1].frame_errors
    assert a[1].frame_errors > 0


def test_bf_waterfall_awgn_hard_vs_ms_gap():
    """At equal Eb/N0 the hard-decision bit-flip decoder must be clearly
    WORSE than soft min-sum — the reference's qualitative claim
    (src/lib.rs:165-172; quantified ΔdB lives in the stored TPU curves,
    STATUS.md). Run both surfaces through the same physical channel."""
    snr = 3.5
    kw = dict(batch=256, max_bits=256 * 256, max_bit_errors=10**9,
              noise_model="ebn0", seed=2)
    (bf,) = waterfall("TC512", [snr], maxiters=50, decoder="bf", **kw)
    (ms,) = waterfall("TC512", [snr], maxiters=50, decoder="ms", **kw)
    assert bf.trials == ms.trials == 256
    assert ms.frame_errors == 0  # soft decoding is comfortable at 3.5 dB
    assert bf.frame_errors > 50  # hard BF is far from it (measured ~226)


def test_bf_trial_step_punctured_erasure_statistical():
    """Random hard-channel errors through a punctured TM code: the
    erasure preprocessor runs inside decode_bf on every trial (statistical
    exercise of the pass, not just fixed 3-flip patterns). At a gentle p
    most frames must still decode."""
    from labrador_ldpc_tpu.channel.hard import make_bf_trial_step

    step = make_bf_trial_step("TM1280", batch=64, maxiters=50,
                              channel="bsc", impl="qc")
    s = step(jax.random.PRNGKey(11), jnp.float32(0.002))
    assert int(s.trials) == 64
    assert int(s.frame_errors) < 32  # most recover


def test_bf_waterfall_sharded_matches_unsharded():
    """The bf trial step under a 'batch' mesh: psum'd counters equal the
    single-device run exactly (partitionable threefry)."""
    from labrador_ldpc_tpu.channel.hard import make_bf_trial_step
    from labrador_ldpc_tpu.parallel import make_batch_mesh

    mesh = make_batch_mesh(jax.devices("cpu")[:8])
    key = jax.random.PRNGKey(9)
    p = jnp.float32(0.02)
    s1 = make_bf_trial_step("TC512", 64, 30, "bsc", "qc")(key, p)
    sn = make_bf_trial_step("TC512", 64, 30, "bsc", "qc", mesh)(key, p)
    for a, b in zip(s1, sn):
        assert int(a) == int(b), (s1, sn)


def test_bf_waterfall_rejects_bad_configs():
    import subprocess
    import sys

    from labrador_ldpc_tpu.channel.hard import make_bf_trial_step

    with pytest.raises(ValueError, match="bsc|perftest|ebn0"):
        make_bf_trial_step("TC128", 8, channel="nope")
    with pytest.raises(ValueError, match="auto|pallas|qc|gather"):
        make_bf_trial_step("TC128", 8, channel="bsc", impl="layered")
    with pytest.raises(ValueError, match="ms|bf"):
        waterfall("TC128", [0.01], batch=8, decoder="sum-product")


def test_bf_trial_step_bec_semantics():
    """BEC channel: f=0 is clean (all decode, zero errors); erased-to-0
    true-1 bits are errors for BF to fix — counters behave monotonically
    and the punctured-tail erasure pass runs on top of channel erasures."""
    from labrador_ldpc_tpu.channel.hard import make_bf_trial_step

    step = make_bf_trial_step("TM1280", batch=64, maxiters=50,
                              channel="bec", impl="qc")
    key = jax.random.PRNGKey(21)
    s0 = step(key, jnp.float32(0.0))
    assert int(s0.bit_errors) == 0 and int(s0.frame_errors) == 0
    s1 = step(key, jnp.float32(0.003))
    s2 = step(key, jnp.float32(0.03))
    assert int(s1.frame_errors) <= int(s2.frame_errors)
    assert int(s2.frame_errors) > 0


def test_ms_hard_trial_step_semantics():
    """The hard-input min-sum surface (channel/hard.py, the decode_ms
    side of the BF-vs-MS framing): seeded-deterministic, worse than soft
    ms at the same dB (soft information thrown away), better than bf at
    the same dB (same input, stronger algorithm), and sharded == unsharded."""
    from labrador_ldpc_tpu.channel.hard import make_ms_hard_trial_step
    from labrador_ldpc_tpu.parallel import make_batch_mesh

    snr = 4.0
    kw = dict(batch=256, max_bits=256 * 256, max_bit_errors=10**9,
              noise_model="ebn0", seed=4)
    (mh,) = waterfall("TC512", [snr], maxiters=50, decoder="ms_hard", **kw)
    (mh2,) = waterfall("TC512", [snr], maxiters=50, decoder="ms_hard", **kw)
    assert (mh.trials, mh.bit_errors, mh.frame_errors) == (
        mh2.trials, mh2.bit_errors, mh2.frame_errors)
    (ms,) = waterfall("TC512", [snr], maxiters=50, decoder="ms", **kw)
    (bf,) = waterfall("TC512", [snr], maxiters=50, decoder="bf", **kw)
    assert ms.frame_errors <= mh.frame_errors <= bf.frame_errors
    assert bf.frame_errors > mh.frame_errors  # strict at 4 dB (measured)

    mesh = make_batch_mesh(jax.devices("cpu")[:8])
    from labrador_ldpc_tpu.channel.awgn import noise_sigma

    key = jax.random.PRNGKey(9)
    sig = jnp.float32(noise_sigma(snr, get_code("TC512"), "ebn0"))
    s1 = make_ms_hard_trial_step("TC512", 64, 50, "ebn0", "layered")(key, sig)
    sn = make_ms_hard_trial_step("TC512", 64, 50, "ebn0", "layered", mesh)(key, sig)
    for a, b in zip(s1, sn):
        assert int(a) == int(b)


def test_uses_pallas_predicate():
    """The mesh shard_map decision must recognize every impl that builds
    an opaque pallas_call (round-5 review: the sp impls were missed by
    the old startswith('pallas') predicate, which would have silently
    REPLICATED the SP kernel across a mesh instead of sharding it)."""
    import labrador_ldpc_tpu.channel.awgn as awgn

    assert awgn.uses_pallas("pallas_qc")
    assert awgn.uses_pallas("pallas_layered")
    assert awgn.uses_pallas("sp_pallas")
    assert not awgn.uses_pallas("layered")
    assert not awgn.uses_pallas("qc")
    assert not awgn.uses_pallas("sp")  # flooding yardstick is XLA-only
    # sp_layered serves the kernel exactly when the backend is TPU
    orig = awgn.jax.default_backend
    try:
        awgn.jax.default_backend = lambda: "tpu"
        assert awgn.uses_pallas("sp_layered")
        awgn.jax.default_backend = lambda: "cpu"
        assert not awgn.uses_pallas("sp_layered")
    finally:
        awgn.jax.default_backend = orig


def test_waterfall_checkpoint_backcompat_decoder_key(tmp_path):
    """Checkpoints written before the 'decoder' config key existed must
    resume (missing key compares against the historical default 'ms'),
    while a bf checkpoint resumed as ms still mismatches loudly."""
    import json as _json

    kw = dict(batch=32, maxiters=10, max_bits=32 * 64 * 2,
              max_bit_errors=10**9, seed=3)
    ck = tmp_path / "old.ckpt"
    waterfall("TC128", snrs_db=[2.0], checkpoint=str(ck), **kw)
    # strip the decoder key, emulating a pre-round-5 checkpoint
    lines = [_json.loads(l) for l in ck.read_text().splitlines()]
    assert lines[0]["kind"] == "config" and lines[0].pop("decoder") == "ms"
    ck.write_text("\n".join(_json.dumps(r) for r in lines) + "\n")
    resumed = waterfall("TC128", snrs_db=[2.0], checkpoint=str(ck), **kw)
    assert resumed[0].trials == 64  # resumed, not rejected
    with pytest.raises(ValueError, match="different"):
        waterfall("TC128", snrs_db=[2.0], checkpoint=str(ck),
                  decoder="bf", **kw)
