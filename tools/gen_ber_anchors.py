"""Regenerate benchmarks/results/ber_regression_points.csv.

Per code, three anchor SNR points spanning the mid-waterfall (BER roughly
5e-2 .. 1e-3) where a reduced-budget CI rerun observes hundreds of errors —
an anchor with ~0 errors cannot detect a regression in either direction.
Budget per point: stop at 5000 bit errors (plenty for a <±5% anchor) or
16M data bits. Production impl (qc, f32), maxiters=100, batch=4096.

Run on the real TPU: python tools/gen_ber_anchors.py
"""

import sys
import os
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from labrador_ldpc_tpu.channel import waterfall

# (code, noise_model, snr list) — mid-waterfall regions picked from the
# stored full curves / round-1 anchors
GRID = [
    ("TC128", "perftest", [1.2, 1.6, 2.0]),
    ("TC256", "perftest", [1.0, 1.4, 1.8]),
    ("TC512", "perftest", [1.0, 1.2, 1.3]),
    ("TM1280", "ebn0", [2.4, 2.8, 3.2]),
    ("TM1536", "ebn0", [1.6, 2.0, 2.4]),
    ("TM2048", "ebn0", [1.0, 1.4, 1.8]),
    ("TM5120", "ebn0", [2.2, 2.6, 3.0]),
    ("TM6144", "ebn0", [1.4, 1.8, 2.0]),
    ("TM8192", "ebn0", [0.9, 1.1, 1.2]),
]

OUT = Path(__file__).resolve().parents[1] / "benchmarks/results/ber_regression_points.csv"


def main():
    rows = []
    for code, model, snrs in GRID:
        pts = waterfall(
            code,
            snrs,
            batch=4096,
            maxiters=100,
            max_bits=16_000_000,
            max_bit_errors=5_000,
            noise_model=model,
            impl="qc",
            seed=0,
            verbose=True,
        )
        for p in pts:
            rows.append(f"{p.csv()},{model},{p.frame_errors}")
    header = (
        "# BER anchors measured on real TPU (tools/gen_ber_anchors.py; impl=qc\n"
        "# f32, maxiters=100, batch=4096, stop at 5k bit errors or 16M data\n"
        "# bits, seed 0).\n"
        "# Columns: code,snr_db,trials,data_bits,bit_errors,ber,noise_model,"
        "frame_errors\n"
        "# Rows whose frame_errors are too few for a reduced-budget CI rerun\n"
        "# to expect >=70 are waterfall-TAIL measurements kept for curve shape\n"
        "# only and MUST NOT be used as regression gates (the reference's own\n"
        "# stopping rule is 5k errors, perftest/src/main.rs:50).\n"
    )
    OUT.write_text(header + "\n".join(rows) + "\n")
    print(f"wrote {len(rows)} anchors to {OUT}")


OUT_I8 = OUT.with_name("ber_regression_points_i8.csv")


def main_i8():
    """Anchor the PRODUCTION int8 layered path (impl=pallas_layered,
    dtype=int8, default quantizer scale 16) on the real TPU at the TM8192
    flagship's mid-waterfall point. The CI gate reruns it with the XLA
    layered int8 twin (make_ms_decoder_layered), which is pinned bit-exact
    to this kernel (tests/test_pallas.py), so the anchor gates the Pallas
    semantics without needing Mosaic in CI."""
    rows = []
    pts = waterfall(
        "TM8192", [1.1], batch=4096, maxiters=100,
        max_bits=16_000_000, max_bit_errors=5_000,
        noise_model="ebn0", dtype_name="int8", impl="pallas_layered",
        seed=0, verbose=True,
    )
    for p in pts:
        rows.append(f"{p.csv()},ebn0,{p.frame_errors}")
    header = (
        "# int8 production-path anchor measured on real TPU\n"
        "# (tools/gen_ber_anchors.py --i8; impl=pallas_layered, dtype=int8,\n"
        "# llr_scale=16, maxiters=100, batch=4096, stop at 5k bit errors or\n"
        "# 16M data bits, seed 0). Gated in tests/test_ber_regression.py via\n"
        "# the bit-exact XLA layered int8 twin.\n"
        "# Columns: code,snr_db,trials,data_bits,bit_errors,ber,noise_model,"
        "frame_errors\n"
    )
    OUT_I8.write_text(header + "\n".join(rows) + "\n")
    print(f"wrote {len(rows)} anchors to {OUT_I8}")


OUT_I8_FLOOD = OUT.with_name("ber_regression_points_i8_flooding.csv")


def main_i8_flooding():
    """Anchor the FLOODING int8 path (reference clamp-everywhere
    semantics — decoder.rs:42-55 — which the native scalar codec also
    implements) at the TM8192 mid-waterfall point, WITH frame errors.

    This is the TPU-side row the independent-executor cross-check
    (tools/native_crosscheck.py, tm8192_i8 anchor) is compared against in
    tests/test_ber_regression.py::test_native_crosscheck_agreement: the
    redesigned wide-accumulator LAYERED int8 anchor (--i8) is deliberately
    ~2x better and must NOT be used for that comparison. Runs the Pallas
    flooding int8 kernel, pinned bit-exact to the XLA qc_int twin by
    tools/tpu_parity.py."""
    pts = waterfall(
        "TM8192", [1.1], batch=4096, maxiters=100,
        max_bits=33_554_432, max_bit_errors=10**9,
        noise_model="ebn0", dtype_name="int8", impl="pallas_qc",
        seed=0, verbose=True,
    )
    rows = [f"{p.csv()},ebn0,{p.frame_errors}" for p in pts]
    header = (
        "# int8 FLOODING-path anchor measured on real TPU\n"
        "# (tools/gen_ber_anchors.py --i8-flooding; impl=pallas_qc,\n"
        "# dtype=int8, llr_scale=16, maxiters=100, batch=4096, 8192 trials,\n"
        "# seed 0). Reference clamp-everywhere semantics - the comparison\n"
        "# row for the native-codec cross-check (test_native_crosscheck_\n"
        "# agreement), NOT a production anchor (the layered redesign in\n"
        "# ber_regression_points_i8.csv is the production int8 path).\n"
        "# Columns: code,snr_db,trials,data_bits,bit_errors,ber,noise_model,"
        "frame_errors\n"
    )
    OUT_I8_FLOOD.write_text(header + "\n".join(rows) + "\n")
    print(f"wrote {len(rows)} anchors to {OUT_I8_FLOOD}")


if __name__ == "__main__":
    if "--i8-flooding" in sys.argv:
        main_i8_flooding()
    elif "--i8" in sys.argv:
        main_i8()
    else:
        main()
