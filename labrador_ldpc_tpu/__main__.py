"""Command-line harness: BER/FER waterfall sweeps and quick codec checks.

TPU-native counterpart of the reference's perftest binary
(perftest/src/main.rs:67-70, which sweeps TC512 at 0.8..2.2 dB and prints
CSV): `python -m labrador_ldpc_tpu waterfall` reproduces that default, with
knobs for code, SNR grid, decoder implementation, dtype, normalization, and
stopping rules. CSV schema matches perftest (`code,snr,trials,bits,errors,
ber`, perftest/src/main.rs:62) so perftest/plot.py-style tooling works
unchanged (see tools/plot_waterfall.py).
"""

from __future__ import annotations

import argparse
import sys


def _cmd_waterfall(args) -> int:
    from .channel.waterfall import waterfall

    # validate dtype/impl compatibility up front with a clear CLI error
    # (the decoder factories raise too, but argparse errors are friendlier)
    if args.decoder == "bf":
        if args.impl not in ("auto", "pallas", "qc", "gather"):
            raise SystemExit(
                "error: --decoder bf takes --impl auto|pallas|qc|gather"
            )
    elif args.decoder == "ms_hard":
        # the hard-input min-sum surface is float32-only and ignores the
        # quantizer/alpha knobs — reject confusing combinations up front
        if args.noise_model == "bec":
            raise SystemExit(
                "error: --noise-model bec requires --decoder bf (erased "
                "bits enter hard decoders as 0; ms_hard takes bsc/"
                "perftest/ebn0)"
            )
        if args.impl in ("qc_i8", "qc_i16", "pallas", "gather"):
            raise SystemExit(
                f"error: --decoder ms_hard does not take --impl {args.impl} "
                "(float32 ms impl space: auto|ref|qc|layered|pallas_qc|"
                "pallas_layered|sp|sp_layered|sp_pallas)"
            )
        if args.dtype != "float32":
            raise SystemExit(
                "error: --decoder ms_hard is float32-only (the hard slice "
                "produces ±1 LLRs; use --decoder ms for quantized fronts)"
            )
        if args.alpha is not None or args.llr_scale is not None:
            raise SystemExit(
                "error: --decoder ms_hard ignores --alpha/--llr-scale; "
                "drop them"
            )
    else:
        if args.noise_model == "bec" or (
            args.noise_model == "bsc" and args.decoder != "ms_hard"
        ):
            raise SystemExit(
                f"error: --noise-model {args.noise_model} requires --decoder "
                f"bf{' or ms_hard' if args.noise_model == 'bsc' else ''}"
            )
        if args.impl in ("pallas", "gather"):
            raise SystemExit(f"error: --impl {args.impl} requires --decoder bf")
        if args.impl.startswith("sp") and args.dtype != "float32":
            raise SystemExit(
                f"error: --impl {args.impl} (sum-product) is float32-only"
            )
        if args.impl == "qc_i8" and args.dtype != "int8":
            raise SystemExit("error: --impl qc_i8 requires --dtype int8")
        if args.impl == "qc_i16" and args.dtype != "int16":
            raise SystemExit("error: --impl qc_i16 requires --dtype int16")
        if args.dtype == "int32" and args.impl not in ("ref", "auto"):
            raise SystemExit("error: --dtype int32 requires --impl ref (or auto)")

    if args.snrs:
        snrs = [float(s) for s in args.snrs.split(",")]
    else:
        snrs = [round(args.snr_start + args.snr_step * i, 10) for i in
                range(int(round((args.snr_stop - args.snr_start) / args.snr_step)) + 1)]
    waterfall(
        args.code,
        snrs,
        batch=args.batch,
        maxiters=args.maxiters,
        max_bits=args.max_bits,
        max_bit_errors=args.max_bit_errors,
        noise_model=args.noise_model,
        dtype_name=args.dtype,
        alpha=args.alpha,
        impl=args.impl,
        llr_scale=args.llr_scale,
        seed=args.seed,
        csv_out=sys.stdout,
        verbose=args.verbose,
        checkpoint=args.checkpoint,
        decoder=args.decoder,
    )
    return 0


def _cmd_info(args) -> int:
    from .codes.params import ALL_CODES

    print(f"{'code':8} {'n':>6} {'k':>6} {'rate':>6} {'p':>5} {'M':>5} {'b':>4} {'|E|':>6}")
    for c in ALL_CODES:
        p = c.params
        print(
            f"{c.value:8} {p.n:>6} {p.k:>6} {p.rate:>6.3f} {p.punctured_bits:>5} "
            f"{p.submatrix_size:>5} {p.circulant_size:>4} {p.paritycheck_sum:>6}"
        )
    return 0


def _cmd_sizes(args) -> int:
    from .sizes import format_memory_table, format_reference_table

    print(format_memory_table())
    print()
    print(format_reference_table())
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="labrador_ldpc_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    w = sub.add_parser("waterfall", help="BER/FER waterfall sweep (perftest analog)")
    w.add_argument("--code", default="TC512", help="code name (default TC512, as perftest)")
    w.add_argument("--snrs", default=None, help="comma-separated SNR (dB) list")
    w.add_argument("--snr-start", type=float, default=0.8)  # perftest/src/main.rs:67-70
    w.add_argument("--snr-stop", type=float, default=2.2)
    w.add_argument("--snr-step", type=float, default=0.1)
    w.add_argument("--batch", type=int, default=1024)
    w.add_argument("--maxiters", type=int, default=100)  # perftest uses 100
    w.add_argument("--max-bits", type=int, default=50_000_000)
    w.add_argument("--max-bit-errors", type=int, default=5_000)
    w.add_argument("--noise-model",
                   choices=["perftest", "ebn0", "bsc", "bec"],
                   default="perftest",
                   help="soft-noise convention, or a hard channel "
                        "('bsc' flips / 'bec' erases-to-0, --decoder bf "
                        "only: --snrs values are probabilities, not dB)")
    w.add_argument("--decoder", choices=["ms", "ms_hard", "bf"],
                   default="ms",
                   help="decode surface: min-sum (soft), min-sum on "
                        "hard-sliced input, or bit-flip (channel/hard.py)")
    w.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16", "float64", "int8", "int16", "int32"])
    w.add_argument("--alpha", type=float, default=None, help="normalized min-sum factor")
    w.add_argument("--impl", choices=["auto", "ref", "qc", "layered", "qc_i8", "qc_i16",
                                      "pallas_qc", "pallas_layered",
                                      "sp", "sp_layered", "sp_pallas",
                                      "pallas", "gather"],
                   default="auto",
                   help="decoder implementation (default auto: the measured-best "
                        "production path — fused Pallas kernels on TPU; int dtypes "
                        "with 'qc' route to the saturating QC int path; with "
                        "--decoder bf the space is auto|pallas|qc|gather)")
    w.add_argument("--llr-scale", type=float, default=None,
                   help="int-LLR quantizer scale (default: 16 for int8, 256 for int16)")
    w.add_argument("--seed", type=int, default=0)
    w.add_argument("--checkpoint", default=None, metavar="PATH",
                   help="persist partial counts to PATH (JSONL) and resume "
                        "an interrupted sweep from it")
    w.add_argument("--verbose", action="store_true")
    w.set_defaults(fn=_cmd_waterfall)

    i = sub.add_parser("info", help="print the code registry table")
    i.set_defaults(fn=_cmd_info)

    sz = sub.add_parser(
        "sizes", help="per-code VMEM/HBM memory tables (docs/MEMORY.md)"
    )
    sz.set_defaults(fn=_cmd_sizes)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
