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
OUT_I8_FLOOD = OUT.with_name("ber_regression_points_i8_flooding.csv")
OUT_I16 = OUT.with_name("ber_regression_points_i16.csv")
OUT_I16_FLOOD = OUT.with_name("ber_regression_points_i16_flooding.csv")


def main_int(bits: int, flooding: bool):
    """Anchor an integer-LLR path at the TM8192 mid-waterfall point.

    Layered (`--i8` / `--i16`): the PRODUCTION int path (impl=
    pallas_layered, default quantizer scale — 16 for int8, 256 for int16).
    The CI gate reruns it with the XLA layered int twin
    (make_ms_decoder_layered), pinned bit-exact to the kernel
    (tests/test_pallas.py), so the anchor gates the Pallas semantics
    without needing Mosaic in CI; the independent NumPy executor
    (oracle.decode_ms_layered_int via tools/native_crosscheck.py) provides
    the second-executor statistical check.

    Flooding (`--i8-flooding` / `--i16-flooding`): the reference
    clamp-everywhere semantics (decoder.rs:42-55), which the native scalar
    C++ codec also implements — the TPU-side comparison rows for
    test_native_crosscheck_agreement. The redesigned wide-accumulator
    LAYERED anchors are deliberately better and must NOT be used for that
    comparison. Fixed 8192 trials (no bit-error stop) so frame counts are
    directly comparable."""
    dtype_name = f"int{bits}"
    scale = {8: 16, 16: 256}[bits]
    if flooding:
        impl, out = "pallas_qc", {8: OUT_I8_FLOOD, 16: OUT_I16_FLOOD}[bits]
        kw = dict(max_bits=33_554_432, max_bit_errors=10**9)
        kind = "FLOODING-path (reference clamp-everywhere semantics)"
        points = [("TM8192", 1.1, "ebn0")]
    else:
        impl, out = "pallas_layered", {8: OUT_I8, 16: OUT_I16}[bits]
        kw = dict(max_bits=16_000_000, max_bit_errors=5_000)
        kind = "production-path (layered, wide posterior accumulator)"
        # TM8192 (lane-major pi kernel) + TC512 (node-major rot kernel):
        # the two kernel families / code structures, each statistically
        # anchored; TC512 at its perftest mid-waterfall point
        points = [("TM8192", 1.1, "ebn0"), ("TC512", 1.0, "perftest")]
    rows = []
    for code, snr, model in points:
        pts = waterfall(
            code, [snr], batch=4096, maxiters=100,
            noise_model=model, dtype_name=dtype_name, impl=impl,
            seed=0, verbose=True, **kw,
        )
        rows += [f"{p.csv()},{model},{p.frame_errors}" for p in pts]
    header = (
        f"# {dtype_name} {kind} anchor(s) measured on real TPU\n"
        f"# (tools/gen_ber_anchors.py; impl={impl}, dtype={dtype_name},\n"
        f"# llr_scale={scale}, maxiters=100, batch=4096, seed 0).\n"
        f"# Gated in tests/test_ber_regression.py.\n"
        "# Columns: code,snr_db,trials,data_bits,bit_errors,ber,noise_model,"
        "frame_errors\n"
    )
    out.write_text(header + "\n".join(rows) + "\n")
    print(f"wrote {len(rows)} anchors to {out}")


OUT_SP = OUT.with_name("ber_regression_points_sp.csv")


def main_sp():
    """Anchor the layered sum-product quality surface (fused Pallas
    kernel via impl='sp_pallas') at a TM8192 point with enough frame
    errors for a reduced-budget CI rerun (0.9 dB: FER ~ 10%; the
    1.1 dB production point has only ~12/4096 FE — too few to gate).
    The CI gate reruns through the bit-exact XLA layered twin
    (impl='sp_layered' resolves to it off-TPU)."""
    pts = waterfall(
        "TM8192", [0.9], batch=4096, maxiters=100,
        max_bits=33_554_432, max_bit_errors=10**9,
        noise_model="ebn0", impl="sp_pallas",
        seed=0, verbose=True,
    )
    rows = [f"{p.csv()},ebn0,{p.frame_errors}" for p in pts]
    header = (
        "# Layered sum-product quality-surface anchor measured on real TPU\n"
        "# (tools/gen_ber_anchors.py --sp; impl=sp_pallas — the fused\n"
        "# layered BP kernel — true-LLR scaling in the trial step,\n"
        "# maxiters=100, batch=4096, 8192 trials, seed 0). Gated in\n"
        "# tests/test_ber_regression.py via the bit-exact XLA layered twin.\n"
        "# Columns: code,snr_db,trials,data_bits,bit_errors,ber,noise_model,"
        "frame_errors\n"
    )
    OUT_SP.write_text(header + "\n".join(rows) + "\n")
    print(f"wrote {len(rows)} anchors to {OUT_SP}")


if __name__ == "__main__":
    if "--sp" in sys.argv:
        main_sp()
    elif "--i8-flooding" in sys.argv:
        main_int(8, flooding=True)
    elif "--i8" in sys.argv:
        main_int(8, flooding=False)
    elif "--i16-flooding" in sys.argv:
        main_int(16, flooding=True)
    elif "--i16" in sys.argv:
        main_int(16, flooding=False)
    else:
        main()
