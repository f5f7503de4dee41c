"""Statistical BER regression gate for the production decoder.

Reruns one mid-waterfall anchor point per code (from
benchmarks/results/ber_regression_points.csv, regenerated on real TPU with
>=5k bit errors per point by tools/gen_ber_anchors.py) at reduced budget
and asserts the observed FRAME-error count lies inside a tolerance band
around the anchor's frame-error rate. Frame errors are the robust
statistic: bit errors cluster within failed frames, so their variance is
governed by the frame count.

The band (x/÷ BAND around the expectation, with >=70 expected frame
errors per case) covers sampling noise (sigma/mu <= 12%, and the run is
seed-deterministic so there is no flakiness) and backend float variation —
measured healthy ratios are 0.84-0.94x — while a real decoder regression
lands outside: in the steep waterfall region these anchors sit on, a
~0.2 dB algorithmic loss (e.g. dropping min-sum self-correction,
decoder.rs:420-426) multiplies the error rate by >2x. Calibrated
deliberate bugs: alpha=0.5 (broken normalization) inflates frame errors
2.32x on TC512 and 13.6x on TM8192; maxiters=6 inflates them 5.0x/13.6x —
all outside the band.

This enforces the driver metric "BER@Eb/N0 parity" in CI, which the
reference only checks via its manually-run perftest
(perftest/src/main.rs:50).
"""

import csv
from pathlib import Path

import pytest

from labrador_ldpc_tpu.channel import waterfall

ANCHOR_CSV = Path(__file__).resolve().parent.parent / \
    "benchmarks/results/ber_regression_points.csv"

# code -> (anchor snr, CI trials); SNRs picked where the anchor has
# hundreds of frame errors AND the waterfall is steep (regression-sensitive)
CASES = {
    "TC128": (1.2, 2048),
    "TC256": (1.0, 2048),
    "TC512": (1.0, 1024),
    "TM1280": (2.8, 1024),
    "TM1536": (2.0, 1024),
    "TM2048": (1.4, 4096),
    "TM5120": (2.6, 512),
    "TM6144": (1.8, 1024),
    "TM8192": (1.1, 2048),
}

BAND = 2.0  # accept observed/expected frame errors in [1/BAND, BAND]


def _anchors(path=ANCHOR_CSV):
    out = {}
    with open(path) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue  # provenance/gating-eligibility header
            code, snr, trials, bits, bit_errs, ber, model, frame_errs = row
            out[(code, float(snr))] = dict(
                trials=int(trials), bits=int(bits), bit_errors=int(bit_errs),
                model=model, frame_errors=int(frame_errs),
            )
    return out


@pytest.mark.parametrize("code", list(CASES))
def test_ber_anchor(code):
    snr, ci_trials = CASES[code]
    a = _anchors()[(code, snr)]
    fer_anchor = a["frame_errors"] / a["trials"]
    expected_fe = fer_anchor * ci_trials
    assert expected_fe >= 70, "anchor/trials choice too weak to detect regressions"

    (pt,) = waterfall(
        code, [snr],
        batch=ci_trials,
        maxiters=100,           # anchor protocol (tools/gen_ber_anchors.py)
        max_bits=1,             # exactly one batch step
        max_bit_errors=10**9,
        noise_model=a["model"],
        impl="qc",
        seed=1,                 # independent sample from the anchor's seed 0
    )
    assert pt.trials == ci_trials
    lo, hi = expected_fe / BAND, expected_fe * BAND
    assert lo <= pt.frame_errors <= hi, (
        f"{code}@{snr}dB: {pt.frame_errors} frame errors vs expected "
        f"{expected_fe:.0f} [{lo:.0f}, {hi:.0f}] — decoder BER regressed "
        f"(anchor FER {fer_anchor:.3e}, observed {pt.fer:.3e})"
    )


# The layered schedule (and its Pallas kernel, bit-exact to it at f32) is
# BETTER than the flooding anchors at these points — measured FER ratios
# 0.54x/0.58x of the qc anchor at maxiters=100 (faster information
# propagation converges more codewords within the budget). The gate is
# therefore ONE-SIDED above (a regression inflates frame errors well past
# BAND) with a loose sanity floor below (counters are computed from real
# bit errors vs ground truth, so "fake success" bugs cannot deflate them).
LAYERED_CASES = {
    "TM2048": (1.4, 4096),
    "TM8192": (1.1, 2048),
}


I8_ANCHOR_CSV = ANCHOR_CSV.with_name("ber_regression_points_i8.csv")


def test_ber_anchor_layered_int8():
    """The PRODUCTION int8 path: anchor measured on real TPU with the
    fused Pallas layered int8 kernel (tools/gen_ber_anchors.py --i8),
    gated here through make_ms_decoder_layered(int8) — its bit-exact XLA
    twin (tests/test_pallas.py pins bits/success/iterations equality), so
    this rerun gates the kernel's saturating semantics without Mosaic.
    Two-sided band as in test_ber_anchor (independent seed => sampling
    noise only; a clip-placement regression lands far outside)."""
    a = _anchors(I8_ANCHOR_CSV)[("TM8192", 1.1)]
    ci_trials = 2048
    expected_fe = a["frame_errors"] / a["trials"] * ci_trials
    assert expected_fe >= 70

    (pt,) = waterfall(
        "TM8192", [1.1],
        batch=ci_trials,
        maxiters=100,
        max_bits=1,
        max_bit_errors=10**9,
        noise_model="ebn0",
        dtype_name="int8",
        impl="layered",
        seed=1,
    )
    assert pt.trials == ci_trials
    lo, hi = expected_fe / BAND, expected_fe * BAND
    assert lo <= pt.frame_errors <= hi, (
        f"TM8192@1.1dB int8 layered: {pt.frame_errors} frame errors vs "
        f"expected {expected_fe:.0f} [{lo:.0f}, {hi:.0f}] — the saturating "
        f"int path's BER regressed"
    )


NATIVE_CSV = ANCHOR_CSV.with_name("ber_native_crosscheck.csv")
I8_FLOOD_CSV = ANCHOR_CSV.with_name("ber_regression_points_i8_flooding.csv")


def _native_rows(path=NATIVE_CSV):
    out = {}
    with open(path) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            code, snr, trials, bits, bit_errs, ber, model, fe, dtype, _sc, _mi = row
            out[(code, float(snr), dtype)] = dict(
                trials=int(trials), bits=int(bits), bit_errors=int(bit_errs),
                model=model, frame_errors=int(fe),
            )
    return out


@pytest.mark.parametrize(
    "code,snr,dtype,tpu_csv",
    [
        ("TC512", 1.0, "float32", ANCHOR_CSV),
        ("TM8192", 1.1, "float32", ANCHOR_CSV),
        ("TM8192", 1.1, "int8", I8_FLOOD_CSV),
        # int16 (VERDICT r4 item 3): native 1130/16384 FE vs TPU Pallas
        # flooding 619/8192 — z = 1.88 at generation
        ("TM8192", 1.1, "int16",
         ANCHOR_CSV.with_name("ber_regression_points_i16_flooding.csv")),
    ],
)
def test_native_crosscheck_agreement(code, snr, dtype, tpu_csv):
    """Absolute-BER parity against an INDEPENDENT executor (VERDICT r3
    item 2): the native scalar C++ codec (reference semantics, bit-exact
    vs the oracle, zero shared code with the jax paths) was driven through
    the exact channel protocol with an independent noise source (numpy
    PCG64 vs jax threefry) by tools/native_crosscheck.py; the TPU anchors
    were measured by this repo's own decoders. Both stored measurements
    of the same (code, SNR, dtype) point must agree within binomial error.

    This is a pure stored-data comparison (no decoding here): a
    two-proportion z-test on the frame-error rates (the robust statistic —
    bit errors cluster within failed frames) plus a BER ratio band.
    Measured z values at generation time: 0.23 (TC512), 0.21 (TM8192
    f32), 0.79 (TM8192 int8 flooding). |z| >= 4 would mean the two
    executors disagree beyond sampling noise — an absolute BER parity
    failure. The int8 row compares against the FLOODING anchor
    (reference clamp-everywhere semantics, which the native codec
    implements), not the redesigned wide-accumulator layered anchor.
    """
    native = _native_rows()[(code, snr, dtype)]
    tpu = _anchors(tpu_csv)[(code, snr)]
    p1, n1 = native["frame_errors"] / native["trials"], native["trials"]
    p2, n2 = tpu["frame_errors"] / tpu["trials"], tpu["trials"]
    pooled = (native["frame_errors"] + tpu["frame_errors"]) / (n1 + n2)
    se = (pooled * (1 - pooled) * (1 / n1 + 1 / n2)) ** 0.5
    z = abs(p1 - p2) / se
    assert z < 4.0, (
        f"{code}@{snr} {dtype}: native FER {p1:.4f} (n={n1}) vs TPU FER "
        f"{p2:.4f} (n={n2}) differ by z={z:.2f} — the TPU decoder's "
        f"absolute BER disagrees with the independent reference-semantics "
        f"executor"
    )
    ber_native = native["bit_errors"] / native["bits"]
    ber_tpu = tpu["bit_errors"] / tpu["bits"]
    ratio = ber_native / ber_tpu
    assert 0.8 < ratio < 1.25, (
        f"{code}@{snr} {dtype}: BER ratio native/TPU = {ratio:.3f} "
        f"({ber_native:.3e} vs {ber_tpu:.3e})"
    )


@pytest.mark.parametrize("code", list(LAYERED_CASES))
def test_ber_anchor_layered(code):
    snr, ci_trials = LAYERED_CASES[code]
    a = _anchors()[(code, snr)]
    fer_anchor = a["frame_errors"] / a["trials"]
    expected_fe = fer_anchor * ci_trials
    assert expected_fe >= 70

    (pt,) = waterfall(
        code, [snr],
        batch=ci_trials,
        maxiters=100,
        max_bits=1,
        max_bit_errors=10**9,
        noise_model=a["model"],
        impl="layered",
        seed=1,
    )
    assert pt.trials == ci_trials
    assert pt.frame_errors <= expected_fe * BAND, (
        f"{code}@{snr}dB layered: {pt.frame_errors} frame errors vs "
        f"flooding-anchor expectation {expected_fe:.0f} — layered BER regressed"
    )
    assert pt.frame_errors >= expected_fe / 10, (
        f"{code}@{snr}dB layered: implausibly few frame errors "
        f"({pt.frame_errors} vs {expected_fe:.0f}) — check the harness"
    )


I16_ANCHOR_CSV = ANCHOR_CSV.with_name("ber_regression_points_i16.csv")
I16_FLOOD_CSV = ANCHOR_CSV.with_name("ber_regression_points_i16_flooding.csv")
ORACLE_CSV = ANCHOR_CSV.with_name("ber_oracle_crosscheck.csv")


def test_ber_anchor_layered_int16():
    """int16 joins the gated dtype matrix (VERDICT r4 item 3): anchor
    measured on real TPU with the fused Pallas layered int16 kernel
    (tools/gen_ber_anchors.py --i16; 145/4096 FE @1.1 dB, scale 256),
    re-run here through the bit-exact XLA layered int16 twin."""
    a = _anchors(I16_ANCHOR_CSV)[("TM8192", 1.1)]
    ci_trials = 2048
    expected_fe = a["frame_errors"] / a["trials"] * ci_trials
    assert expected_fe >= 70

    (pt,) = waterfall(
        "TM8192", [1.1],
        batch=ci_trials,
        maxiters=100,
        max_bits=1,
        max_bit_errors=10**9,
        noise_model="ebn0",
        dtype_name="int16",
        impl="layered",
        seed=1,
    )
    assert pt.trials == ci_trials
    lo, hi = expected_fe / BAND, expected_fe * BAND
    assert lo <= pt.frame_errors <= hi, (
        f"TM8192@1.1dB int16 layered: {pt.frame_errors} frame errors vs "
        f"expected {expected_fe:.0f} [{lo:.0f}, {hi:.0f}] — the saturating "
        f"int16 path's BER regressed"
    )


@pytest.mark.parametrize(
    "dtype,tpu_csv",
    [("int8", I8_ANCHOR_CSV), ("int16", I16_ANCHOR_CSV)],
)
def test_oracle_layered_crosscheck_agreement(dtype, tpu_csv):
    """The LAYERED wide-accumulator int semantics (the repo's redesigned
    production int path — no counterpart in the reference, so the native
    C++ codec cannot check it) measured by a second independently-written
    executor: utils/oracle.decode_ms_layered_int (scalar NumPy over CSR
    edge tables, numpy PCG64 noise — tools/native_crosscheck.py
    *_layered anchors) vs the TPU Pallas anchors. Stored-data
    two-proportion z-test, same shape as test_native_crosscheck_agreement
    (VERDICT r4 item 7: no anchor in the BER chain is single-executor).
    Measured z at generation: 0.14 (int8: 174 vs 168 FE/4096) and 0.18
    (int16: 148 vs 145)."""
    oracle_rows = _native_rows(ORACLE_CSV)
    o = oracle_rows[("TM8192", 1.1, dtype)]
    t = _anchors(tpu_csv)[("TM8192", 1.1)]
    p1, n1 = o["frame_errors"] / o["trials"], o["trials"]
    p2, n2 = t["frame_errors"] / t["trials"], t["trials"]
    pooled = (o["frame_errors"] + t["frame_errors"]) / (n1 + n2)
    se = (pooled * (1 - pooled) * (1 / n1 + 1 / n2)) ** 0.5
    z = abs(p1 - p2) / se
    assert z < 4.0, (
        f"TM8192@1.1 {dtype} layered: independent-executor FER {p1:.4f} "
        f"(n={n1}) vs TPU FER {p2:.4f} (n={n2}) differ by z={z:.2f}"
    )
    ratio = (o["bit_errors"] / o["bits"]) / (t["bit_errors"] / t["bits"])
    assert 0.8 < ratio < 1.25, f"BER ratio oracle/TPU = {ratio:.3f}"


BF_BSC_CSV = ANCHOR_CSV.with_name("waterfall_bf_tc512_bsc.csv")


def _bf_curve_rows(path=BF_BSC_CSV):
    out = {}
    with open(path) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            code, x, trials, bits, bit_errs, ber, fe, fer = row
            out[(code, float(x))] = dict(
                trials=int(trials), bits=int(bits), bit_errors=int(bit_errs),
                frame_errors=int(fe),
            )
    return out


def test_bf_ber_anchor_bsc():
    """The hard-decision surface's statistical CI gate (VERDICT r4
    item 2): the TC512 BSC(p=0.03) point was measured on real TPU with
    the fused Pallas bf kernel (tools/gen_bf_curves.py, ~4.1e-2 FER);
    rerun here at reduced budget through the XLA QC bf decoder — pinned
    bit-exact to the kernel (tests/test_pallas_bf.py) — with an
    independent seed. A decode_bf semantics regression (flip rule,
    parity, erasure preprocessing) inflates frame errors far outside the
    band; the counters are computed from real bit errors vs ground
    truth, so fake-success bugs cannot deflate them. Calibrated:
    healthy rerun 160 FE vs expected ~169 (band [85, 339]); a
    budget-starving bug (maxiters=5) measures 1553 FE (9.7x) and
    maxiters=2 measures 3104 (19x) — both far outside."""
    a = _bf_curve_rows()[("TC512", 0.03)]
    ci_trials = 4096
    expected_fe = a["frame_errors"] / a["trials"] * ci_trials
    assert expected_fe >= 70

    (pt,) = waterfall(
        "TC512", [0.03],
        batch=ci_trials,
        maxiters=50,
        max_bits=1,
        max_bit_errors=10**9,
        noise_model="bsc",
        decoder="bf",
        impl="qc",
        seed=1,
    )
    assert pt.trials == ci_trials
    lo, hi = expected_fe / BAND, expected_fe * BAND
    assert lo <= pt.frame_errors <= hi, (
        f"TC512 BSC(0.03) bf: {pt.frame_errors} frame errors vs expected "
        f"{expected_fe:.0f} [{lo:.0f}, {hi:.0f}] — decode_bf BER regressed"
    )


GAP_TABLE_CSV = ANCHOR_CSV.with_name("bf_ms_gap_table.csv")


def test_bf_ms_gap_table_consistent():
    """Stored-data checks on the all-nine-codes BF-vs-MS gap table
    (tools/gen_gap_table.py, round 5):

    * every code has a row and the decomposition is additive;
    * the hard-slice penalty is the textbook ~2 dB everywhere
      (1.2-2.6 dB band — it varies with code rate);
    * the algorithmic gap is positive everywhere (bf never beats ms at
      matched hard input), within the reference's "one to two dB" band
      for the TC codes, and larger for the punctured TM codes;
    * the independently measured deep-curve numbers for TC512/TM8192
      (tools/gen_bf_curves.py, different grids and budgets) agree with
      the table's adaptive-walk numbers within interpolation tolerance.
    """
    rows = {}
    with open(GAP_TABLE_CSV) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            code, tgt, bf, mh, ms, d_tot, d_alg, d_hard = row
            rows[code] = dict(
                bf=float(bf), mh=float(mh), ms=float(ms),
                d_tot=float(d_tot), d_alg=float(d_alg), d_hard=float(d_hard),
            )
    assert set(rows) == {
        "TC128", "TC256", "TC512", "TM1280", "TM1536", "TM2048",
        "TM5120", "TM6144", "TM8192",
    }
    for code, r in rows.items():
        assert abs((r["d_alg"] + r["d_hard"]) - r["d_tot"]) < 0.02, code
        assert 1.2 <= r["d_hard"] <= 2.6, (code, r["d_hard"])
        assert r["d_alg"] > 0.5, (code, r["d_alg"])
    for code in ("TC128", "TC256", "TC512"):
        assert rows[code]["d_alg"] <= 2.8, (code, rows[code])
    # punctured high-rate TM codes degrade bf far beyond the TC band
    assert rows["TM8192"]["d_alg"] >= 4.0
    # cross-method agreement (adaptive walk vs deep fixed grids)
    from tools.gen_bf_curves import RESULTS, db_at_fer, read_fer

    for code in ("TC512", "TM8192"):
        deep_bf = db_at_fer(
            read_fer(RESULTS / f"waterfall_bf_{code.lower()}_ebn0.csv"), 1e-3
        )
        assert abs(deep_bf - rows[code]["bf"]) < 0.2, (
            code, deep_bf, rows[code]["bf"]
        )


@pytest.mark.parametrize(
    "code,snr,model,dtype,csv_path",
    [
        ("TC512", 1.0, "perftest", "int8",
         ANCHOR_CSV.with_name("ber_regression_points_i8.csv")),
        ("TC512", 1.0, "perftest", "int16",
         ANCHOR_CSV.with_name("ber_regression_points_i16.csv")),
    ],
)
def test_ber_anchor_layered_int_tc512(code, snr, model, dtype, csv_path):
    """Second code family for the layered-int gates (round 5): TC512 —
    node-major rot kernels vs TM8192's lane-major pi kernels — anchored
    on real TPU (2557/16384 int8, 2479/16384 int16 FE @1.0 dB perftest)
    and rerun here through the bit-exact XLA layered int twin."""
    a = _anchors(csv_path)[(code, snr)]
    ci_trials = 1024
    expected_fe = a["frame_errors"] / a["trials"] * ci_trials
    assert expected_fe >= 70

    (pt,) = waterfall(
        code, [snr],
        batch=ci_trials,
        maxiters=100,
        max_bits=1,
        max_bit_errors=10**9,
        noise_model=model,
        dtype_name=dtype,
        impl="layered",
        seed=1,
    )
    assert pt.trials == ci_trials
    lo, hi = expected_fe / BAND, expected_fe * BAND
    assert lo <= pt.frame_errors <= hi, (
        f"{code}@{snr} {dtype} layered: {pt.frame_errors} frame errors vs "
        f"expected {expected_fe:.0f} [{lo:.0f}, {hi:.0f}]"
    )


@pytest.mark.parametrize(
    "code,snr,dtype",
    [("TC512", 1.0, "int8"), ("TC512", 1.0, "int16")],
)
def test_oracle_layered_crosscheck_agreement_tc512(code, snr, dtype):
    """TC512 rows of the independent layered-int executor (z at
    generation: 2.43 int8, 0.50 int16)."""
    suffix = "i8" if dtype == "int8" else "i16"
    tpu_csv = ANCHOR_CSV.with_name(f"ber_regression_points_{suffix}.csv")
    o = _native_rows(ORACLE_CSV)[(code, snr, dtype)]
    t = _anchors(tpu_csv)[(code, snr)]
    p1, n1 = o["frame_errors"] / o["trials"], o["trials"]
    p2, n2 = t["frame_errors"] / t["trials"], t["trials"]
    pooled = (o["frame_errors"] + t["frame_errors"]) / (n1 + n2)
    se = (pooled * (1 - pooled) * (1 / n1 + 1 / n2)) ** 0.5
    z = abs(p1 - p2) / se
    assert z < 4.0, (code, dtype, z)
    ratio = (o["bit_errors"] / o["bits"]) / (t["bit_errors"] / t["bits"])
    assert 0.8 < ratio < 1.25, (code, dtype, ratio)


BSC_THRESH_CSV = ANCHOR_CSV.with_name("bsc_thresholds.csv")


def test_bsc_thresholds_consistent():
    """Stored-data checks on the BSC operating-point table
    (tools/gen_bsc_thresholds.py): all nine codes present; min-sum on
    hard input always tolerates a higher flip probability than
    bit-flipping (ratio > 1, growing toward low-rate codes); the bf
    crossings agree with the independently measured deep BSC curves
    (different grids/budgets) within interpolation tolerance; the
    rate-1/2 ms_hard thresholds sit below the BSC capacity-ish bound
    (p ~ 0.11 for r=1/2)."""
    rows = {}
    with open(BSC_THRESH_CSV) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            code, tgt, p_bf, p_mh, ratio = row
            rows[code] = (float(p_bf), float(p_mh), float(ratio))
    assert len(rows) == 9
    for code, (p_bf, p_mh, ratio) in rows.items():
        assert 0 < p_bf < p_mh < 0.12, (code, p_bf, p_mh)
        assert ratio > 1.5, (code, ratio)
    # rate-1/2 TM ms_hard thresholds approach but stay under ~0.11
    assert 0.05 < rows["TM8192"][1] < 0.11
    assert 0.05 < rows["TM2048"][1] < 0.11
    # cross-method: bf crossings vs the stored deep BSC curves
    from tools.gen_bf_curves import RESULTS, db_at_fer, read_fer

    for code in ("TC512", "TM8192"):
        deep = db_at_fer(
            read_fer(RESULTS / f"waterfall_bf_{code.lower()}_bsc.csv"), 1e-3
        )
        walk = rows[code][0]
        assert abs(deep - walk) / walk < 0.12, (code, deep, walk)


SP_GAP_CSV = ANCHOR_CSV.with_name("sp_ms_gap.csv")


def test_sp_ms_gap_consistent():
    """Stored-data checks on the min-sum-vs-sum-product table
    (tools/gen_sp_gap.py): the reference's claim that min-sum "performs
    very close to the optimal sum-product algorithm"
    (src/lib.rs:217-218), MEASURED — |gap| <= 0.35 dB at FER 1e-3 on
    every measured code. The sign structure is the interesting part:
    self-corrected min-sum BEATS plain BP on the short-cycle TC codes
    (BP's independence assumption fails at girth ~short; SCMS's
    oscillation damping is more robust) and trails it by only
    0.10-0.16 dB on the long TM codes."""
    rows = {}
    with open(SP_GAP_CSV) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            code, tgt, sp, msf, ms, d_f, d_l = row
            rows[code] = (float(sp), float(msf), float(ms), float(d_f),
                          float(d_l))
    assert set(rows) >= {"TC128", "TC512", "TM2048", "TM8192"}
    for code, (sp, msf, ms, d_f, d_l) in rows.items():
        assert abs(d_f - (msf - sp)) < 0.01 and abs(d_l - (ms - sp)) < 0.01
        assert abs(d_f) <= 0.35, (code, d_f)  # "very close": confirmed
        assert abs(d_l) <= 0.35, (code, d_l)
    # sign structure: ms wins on short-cycle TC codes, trails on long TM
    assert rows["TC128"][3] < 0 and rows["TC512"][3] < 0
    assert rows["TM8192"][3] > 0 and rows["TM2048"][3] > 0


SP_ANCHOR_CSV = ANCHOR_CSV.with_name("ber_regression_points_sp.csv")


def test_ber_anchor_sp_layered():
    """The layered sum-product quality surface (round 5): anchor measured
    on real TPU with the fused Pallas BP kernel (gen_ber_anchors --sp;
    582/8192 FE @0.9 dB), rerun here through the bit-exact XLA layered
    twin (impl='sp_layered' resolves to it off-TPU). Completes the gate
    matrix: every decode surface — ms f32/int8/int16 (layered +
    flooding), bf, and now sp — is statistically anchored."""
    a = _anchors(SP_ANCHOR_CSV)[("TM8192", 0.9)]
    ci_trials = 1024
    expected_fe = a["frame_errors"] / a["trials"] * ci_trials
    assert expected_fe >= 70

    (pt,) = waterfall(
        "TM8192", [0.9],
        batch=ci_trials,
        maxiters=100,
        max_bits=1,
        max_bit_errors=10**9,
        noise_model="ebn0",
        impl="sp_layered",
        seed=1,
    )
    assert pt.trials == ci_trials
    lo, hi = expected_fe / BAND, expected_fe * BAND
    assert lo <= pt.frame_errors <= hi, (
        f"TM8192@0.9dB sp_layered: {pt.frame_errors} frame errors vs "
        f"expected {expected_fe:.0f} [{lo:.0f}, {hi:.0f}] — the sum-product "
        f"quality surface regressed"
    )
