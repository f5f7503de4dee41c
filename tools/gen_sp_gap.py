"""Measure the reference's last untested claim: "min-sum performs very
close to the optimal sum-product algorithm" (src/lib.rs:217-218).

The crate cites sum-product as the optimality yardstick but never
instantiates it; ops/sumproduct.py does (flooding BP, true-LLR scaling).
This tool walks the FER 1e-3 Eb/N0 crossing for three decoders on the
soft AWGN channel (adaptive walk + interpolation, gen_gap_table
machinery):

  sp        flooding sum-product (the yardstick)
  ms_flood  flooding self-corrected min-sum (the REFERENCE's algorithm,
            fused Pallas kernel, bit-exact to it)
  ms        the production layered self-corrected min-sum

Writes benchmarks/results/sp_ms_gap.csv (+ probe points appended to
sp_ms_gap_points.csv). Run on real TPU:
python tools/gen_sp_gap.py [--codes TC128,TC512,TM2048,TM8192]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gen_gap_table import MS_START, RESULTS, cross_db  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--codes", default="TC128,TC512,TM2048,TM8192")
    ap.add_argument("--target", type=float, default=1e-3)
    args = ap.parse_args()
    codes = args.codes.split(",")

    points_log: list[str] = []
    rows = []
    for code in codes:
        res = {}
        for surface in ("sp", "ms_flood", "ms"):
            res[surface] = cross_db(code, surface, args.target, points_log)
        rows.append(
            f"{code},{args.target:g},{res['sp']:.3f},{res['ms_flood']:.3f},"
            f"{res['ms']:.3f},{res['ms_flood'] - res['sp']:.3f},"
            f"{res['ms'] - res['sp']:.3f}"
        )
        print(f"{code}: sp {res['sp']:.3f} / ms_flood {res['ms_flood']:.3f} "
              f"/ ms {res['ms']:.3f} dB -> flood-vs-sp "
              f"{res['ms_flood'] - res['sp']:+.3f} dB, layered-vs-sp "
              f"{res['ms'] - res['sp']:+.3f} dB", flush=True)

    header = (
        "# Min-sum vs sum-product Eb/N0 gap at FER {t:g}\n"
        "# (tools/gen_sp_gap.py on real TPU; soft AWGN ebn0; adaptive walk;\n"
        "# sp = flooding BP w/ true LLRs, ms_flood = reference flooding SCMS\n"
        "# on the fused kernel, ms = production layered SCMS; batch 8192,\n"
        "# maxiters 100, seed 0).\n"
        "# Columns: code,fer_target,sp_db,ms_flood_db,ms_db,"
        "delta_flood_db,delta_layered_db\n"
    ).format(t=args.target)
    (RESULTS / "sp_ms_gap.csv").write_text(header + "\n".join(rows) + "\n")
    pts_header = (
        "# Probe points behind sp_ms_gap.csv.\n"
        "# Columns: code,surface,ebn0_db,trials,data_bits,bit_errors,ber,"
        "frame_errors,fer\n"
    )
    (RESULTS / "sp_ms_gap_points.csv").write_text(
        pts_header + "\n".join(points_log) + "\n"
    )
    print(f"wrote {len(rows)} rows to {RESULTS / 'sp_ms_gap.csv'}")


if __name__ == "__main__":
    main()
