"""Independent-executor BER cross-check: drive the NATIVE scalar codec
(reference semantics, bit-exact vs the oracle — native/labrador_ldpc.cpp)
through the exact channel protocol used for the TPU BER anchors, with an
INDEPENDENT noise source (numpy PCG64, not jax threefry).

This closes the absolute-BER parity loop: every stored anchor in
benchmarks/results/ber_regression_points*.csv was measured by this repo's
own TPU implementations; the parity chain (reference transliteration ->
bit-exact `ref` impl -> outcome-equal fast impls) is sound but
self-referential. Here a second, independently-written executor of the
reference algorithm (the C++ codec, which shares no code with the jax
paths) measures the same (code, SNR) points statistically; agreement
within binomial error is the cross-check.

Protocol per trial (mirrors channel/awgn.make_trial_step and the
reference perftest, /root/reference/perftest/src/main.rs:9-65):
  random data bytes -> native copy_encode -> BPSK +-1 LLRs -> AWGN(sigma)
  -> [int dtypes: quantize clip(round(llr*scale))] -> native decode_ms
  -> count data-bit errors / frame errors.

Noise conventions match channel/awgn.noise_sigma:
  perftest: sigma = 10^(-snr/10)            (main.rs:15)
  ebn0:     sigma = (2 R 10^(snr/10))^-1/2  (physical BPSK Eb/N0)

Results append to benchmarks/results/ber_native_crosscheck.csv and are
compared to the stored TPU anchors by
tests/test_ber_regression.py::test_native_crosscheck_agreement.

Usage:
  python tools/native_crosscheck.py                # both default anchors
  python tools/native_crosscheck.py --calibrate    # rate estimate only
  python tools/native_crosscheck.py --anchor tc512 # one anchor
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from dataclasses import dataclass
from multiprocessing import Pool
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RESULTS = Path(__file__).resolve().parent.parent / "benchmarks" / "results"
CSV = RESULTS / "ber_native_crosscheck.csv"
CSV_ORACLE = RESULTS / "ber_oracle_crosscheck.csv"
PROGRESS = RESULTS / "ber_native_crosscheck_progress.jsonl"

HEADER = (
    "# Independent-executor cross-check rows: the native scalar codec\n"
    "# (reference semantics, bit-exact vs utils/oracle.py) run through the\n"
    "# exact channel protocol with numpy PCG64 noise (tools/native_crosscheck.py).\n"
    "# Compared against the TPU-measured anchors in ber_regression_points*.csv\n"
    "# by tests/test_ber_regression.py::test_native_crosscheck_agreement.\n"
    "# Columns: code,snr_db,trials,data_bits,bit_errors,ber,noise_model,"
    "frame_errors,dtype,llr_scale,maxiters\n"
)

HEADER_ORACLE = (
    "# Independent-executor cross-check rows for the LAYERED wide-\n"
    "# accumulator int semantics: the scalar NumPy executor\n"
    "# (utils/oracle.decode_ms_layered_int, bit-exact vs the XLA twin but\n"
    "# sharing no code with it) run through the exact channel protocol\n"
    "# with numpy PCG64 noise (tools/native_crosscheck.py, *_layered\n"
    "# anchors). Compared against the TPU layered anchors\n"
    "# (ber_regression_points_i8.csv / _i16.csv) by\n"
    "# tests/test_ber_regression.py::test_oracle_layered_crosscheck_agreement.\n"
    "# Columns: code,snr_db,trials,data_bits,bit_errors,ber,noise_model,"
    "frame_errors,dtype,llr_scale,maxiters\n"
)


@dataclass(frozen=True)
class Anchor:
    name: str
    code: str
    snr_db: float
    model: str  # "perftest" | "ebn0"
    dtype: str  # "float32" | "int8" | "int16"
    llr_scale: float | None
    maxiters: int
    trials: int
    seed: int
    # which independently-written executor decodes the trials:
    #   "native":         the scalar C++ codec (reference flooding
    #                     semantics, bit-exact vs utils/oracle.decode_ms)
    #   "oracle_layered": the scalar NumPy executor of the redesigned
    #                     wide-accumulator layered int semantics
    #                     (utils/oracle.decode_ms_layered_int — shares no
    #                     code with the jax/Pallas twins; VERDICT r4
    #                     item 7). Its rows go to ber_oracle_crosscheck.csv.
    executor: str = "native"


# The anchors, matched to stored TPU rows:
#  - TC512 @1.0 dB perftest f32 (ber_regression_points.csv: 745/4096 FE)
#  - TM8192 @1.1 dB ebn0 int8 scale 16 — the native codec carries the
#    reference's clamp-everywhere FLOODING int semantics, so it checks the
#    flooding qc_i8 path (337/4096 FE per STATUS.md; full curve
#    waterfall_tm8192_ebn0_qc_i8.csv), NOT the redesigned wide-accumulator
#    layered path (168/4096) — THAT path's independent check is the
#    "*_layered" anchors below via the oracle_layered executor.
ANCHORS = {
    "tc512": Anchor(
        "tc512", "TC512", 1.0, "perftest", "float32", None, 100, 32768, 7001
    ),
    "tm8192_i8": Anchor(
        "tm8192_i8", "TM8192", 1.1, "ebn0", "int8", 16.0, 100, 16384, 7002
    ),
    # Secondary f32 anchor at the same SNR (checks the float path on the
    # flagship code; TPU row TM8192@1.1 ebn0 f32 in ber_regression_points.csv).
    "tm8192_f32": Anchor(
        "tm8192_f32", "TM8192", 1.1, "ebn0", "float32", None, 100, 16384, 7003
    ),
    # int16 flooding cross-check (VERDICT r4 item 3): compared against the
    # TPU flooding int16 anchor (ber_regression_points_i16_flooding.csv).
    "tm8192_i16": Anchor(
        "tm8192_i16", "TM8192", 1.1, "ebn0", "int16", 256.0, 100, 16384, 7005
    ),
    # The layered wide-accumulator int paths via the independent NumPy
    # executor (VERDICT r4 item 7): compared against the TPU layered
    # anchors (ber_regression_points_i8.csv / _i16.csv).
    "tm8192_i8_layered": Anchor(
        "tm8192_i8_layered", "TM8192", 1.1, "ebn0", "int8", 16.0, 100, 4096,
        7004, executor="oracle_layered",
    ),
    "tm8192_i16_layered": Anchor(
        "tm8192_i16_layered", "TM8192", 1.1, "ebn0", "int16", 256.0, 100,
        4096, 7006, executor="oracle_layered",
    ),
    # second code family for the layered-int chain (round 5): TC512 at
    # its perftest mid-waterfall point — node-major rot kernels vs
    # TM8192's lane-major pi kernels
    "tc512_i8_layered": Anchor(
        "tc512_i8_layered", "TC512", 1.0, "perftest", "int8", 16.0, 100,
        8192, 7007, executor="oracle_layered",
    ),
    "tc512_i16_layered": Anchor(
        "tc512_i16_layered", "TC512", 1.0, "perftest", "int16", 256.0, 100,
        8192, 7008, executor="oracle_layered",
    ),
}


def _sigma(a: Anchor, k: int, n: int) -> float:
    if a.model == "perftest":
        return float(10.0 ** (-a.snr_db / 10.0))
    rate = k / n
    return float((2.0 * rate * 10.0 ** (a.snr_db / 10.0)) ** -0.5)


def run_chunk(args):
    """One worker chunk: `count` independent trials; returns counters."""
    anchor_name, chunk_id, count = args
    a = ANCHORS[anchor_name]
    from labrador_ldpc_tpu import capi
    from labrador_ldpc_tpu.codes.params import get_code

    code = get_code(a.code)
    k, n = code.k, code.n
    sigma = _sigma(a, k, n)
    rng = np.random.default_rng([a.seed, chunk_id])
    bit_errors = 0
    frame_errors = 0
    failures = 0
    iterations = 0
    if a.executor == "oracle_layered":
        from labrador_ldpc_tpu.utils.oracle import decode_ms_layered_int

        def _decode(llrs):
            return decode_ms_layered_int(code, llrs, maxiters=a.maxiters)
    else:

        def _decode(llrs):
            return capi.decode_ms(code, llrs, maxiters=a.maxiters)

    for _ in range(count):
        data = rng.integers(0, 256, k // 8, dtype=np.uint8)
        cw = capi.copy_encode(code, data)
        bits = np.unpackbits(cw)  # (n,) msb-first, the codec's bit order
        tx = 1.0 - 2.0 * bits.astype(np.float64)
        soft = tx + rng.normal(0.0, sigma, n)
        if a.dtype in ("int8", "int16"):
            info = np.iinfo(a.dtype)
            llrs = np.clip(
                np.round(soft * a.llr_scale), info.min, info.max
            ).astype(a.dtype)
        else:
            llrs = soft.astype(np.float32)
        ok, iters, out = _decode(llrs)
        be = int(np.unpackbits(out[: k // 8] ^ data).sum())
        bit_errors += be
        frame_errors += be > 0
        failures += not ok
        iterations += iters
    return {
        "anchor": anchor_name,
        "chunk": chunk_id,
        "trials": count,
        "bit_errors": bit_errors,
        "frame_errors": frame_errors,
        "failures": failures,
        "iterations": iterations,
    }


def run_anchor(a: Anchor, procs: int, chunk_size: int = 64) -> dict:
    chunks = [
        (a.name, i, min(chunk_size, a.trials - i * chunk_size))
        for i in range((a.trials + chunk_size - 1) // chunk_size)
    ]
    t0 = time.time()
    total = {"trials": 0, "bit_errors": 0, "frame_errors": 0, "failures": 0,
             "iterations": 0}
    with Pool(procs) as pool, open(PROGRESS, "a") as prog:
        for res in pool.imap_unordered(run_chunk, chunks):
            for key in total:
                total[key] += res[key]
            prog.write(json.dumps({**res, "t": round(time.time() - t0, 1)}) + "\n")
            prog.flush()
            done = total["trials"]
            rate = done / (time.time() - t0)
            print(
                f"[{a.name}] {done}/{a.trials} trials, "
                f"FE={total['frame_errors']} BE={total['bit_errors']} "
                f"({rate:.1f} cw/s, ETA {(a.trials - done) / max(rate, 1e-9):.0f}s)",
                flush=True,
            )
    return total


def write_row(a: Anchor, total: dict) -> None:
    from labrador_ldpc_tpu.codes.params import get_code

    k = get_code(a.code).k
    data_bits = total["trials"] * k
    ber = total["bit_errors"] / data_bits
    row = (
        f"{a.code},{a.snr_db},{total['trials']},{data_bits},"
        f"{total['bit_errors']},{ber:.6e},{a.model},{total['frame_errors']},"
        f"{a.dtype},{a.llr_scale if a.llr_scale is not None else ''},{a.maxiters}\n"
    )
    csv_path = CSV_ORACLE if a.executor == "oracle_layered" else CSV
    header = HEADER_ORACLE if a.executor == "oracle_layered" else HEADER
    if not csv_path.exists():
        csv_path.write_text(header)
    with open(csv_path, "a") as f:
        f.write(row)
    print(f"[{a.name}] row appended to {csv_path}:\n{row}", flush=True)


def calibrate(procs: int) -> None:
    for a in ANCHORS.values():
        t0 = time.time()
        res = run_chunk((a.name, 999999, 8))
        dt = time.time() - t0
        print(
            f"[calibrate {a.name}] 8 trials in {dt:.1f}s -> "
            f"{8 / dt:.2f} cw/s/core; {a.trials} trials ~ "
            f"{a.trials / (8 / dt) / procs / 60:.1f} min on {procs} cores "
            f"(FE={res['frame_errors']}, iters={res['iterations']})",
            flush=True,
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--anchor", choices=sorted(ANCHORS), action="append")
    ap.add_argument("--procs", type=int, default=4)
    ap.add_argument("--calibrate", action="store_true")
    args = ap.parse_args()
    # build the .so up-front in the parent so workers don't race the compiler
    from labrador_ldpc_tpu import capi

    capi.lib()
    if args.calibrate:
        calibrate(args.procs)
        return
    names = args.anchor or ["tc512", "tm8192_i8", "tm8192_f32"]
    for name in names:
        a = ANCHORS[name]
        total = run_anchor(a, args.procs)
        write_row(a, total)
    print("done", flush=True)


if __name__ == "__main__":
    main()
