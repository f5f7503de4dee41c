"""BSC operating points for the hard-decision decoders, all nine codes.

For each code, find the flip probability p* where FER crosses 1e-3 on
the canonical hard channel (BSC(p), channel/hard.py) for both
hard-input decode surfaces:

  bf      — Gallager bit-flipping (fused Pallas kernels, impl=auto)
  ms_hard — min-sum over +-1 LLRs from the same flipped bits

p* is the engineering answer to "how many channel bit-flips can this
code take": the reference documents no such numbers anywhere. The walk
is multiplicative (p shrinks 0.82x per step from a high-FER start) with
log-log interpolation of the crossing, >= ~60 frame errors at the
target; seed 0, batch 8192, maxiters 50 (bf) / 100 (ms_hard).

Writes benchmarks/results/bsc_thresholds.csv (+ probe points in
bsc_threshold_points.csv). Run on the real TPU:
python tools/gen_bsc_thresholds.py [--codes ...] [--target 1e-3]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

RESULTS = Path(__file__).resolve().parents[1] / "benchmarks" / "results"

# high-FER starting p per code (bf first, ms_hard scales up ~2-4x);
# coarse is fine — the walk self-corrects
P_START_BF = {
    "TC128": 0.03, "TC256": 0.03, "TC512": 0.03,
    "TM1280": 0.01, "TM1536": 0.012, "TM2048": 0.01,
    "TM5120": 0.006, "TM6144": 0.006, "TM8192": 0.005,
}

BATCH = 8192
SHRINK = 0.82
K = {"TC128": 64, "TC256": 128, "TC512": 256, "TM1280": 1024,
     "TM1536": 1024, "TM2048": 1024, "TM5120": 4096, "TM6144": 4096,
     "TM8192": 4096}


def fer_at(code, surface, p, trials, points_log):
    from labrador_ldpc_tpu.channel.waterfall import waterfall

    maxiters = 50 if surface == "bf" else 100
    (pt,) = waterfall(
        code, [p], batch=BATCH, maxiters=maxiters,
        max_bits=trials * K[code], max_bit_errors=10**9,
        noise_model="bsc", decoder=surface, seed=0,
    )
    points_log.append(
        f"{code},{surface},{p:.6g},{pt.trials},{pt.bits},{pt.bit_errors},"
        f"{pt.ber:.6e},{pt.frame_errors},{pt.fer:.6e}"
    )
    print(f"  {code:7} {surface:8} p={p:.5f}  FER {pt.fer:.3e} "
          f"({pt.frame_errors}/{pt.trials})", flush=True)
    return pt.fer


def cross_p(code, surface, target, points_log):
    """The generic walker (gen_gap_table.cross_db — round-5 review
    dedup) on a multiplicative p axis with log-x interpolation."""
    from gen_gap_table import cross_db

    return cross_db(
        code, surface, target, points_log,
        fer_fn=fer_at,
        start=P_START_BF[code] * (3.0 if surface == "ms_hard" else 1.0),
        advance=lambda x: x * SHRINK,
        retreat=lambda x: x / SHRINK**4,
        interp=lambda x0, x1, t: math.exp(
            math.log(x0) + t * (math.log(x1) - math.log(x0))
        ),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--codes", default=None)
    ap.add_argument("--target", type=float, default=1e-3)
    args = ap.parse_args()
    codes = args.codes.split(",") if args.codes else list(P_START_BF)

    points_log: list[str] = []
    rows = []
    for code in codes:
        p_bf = cross_p(code, "bf", args.target, points_log)
        p_mh = cross_p(code, "ms_hard", args.target, points_log)
        rows.append(f"{code},{args.target:g},{p_bf:.6g},{p_mh:.6g},"
                    f"{p_mh / p_bf:.2f}")
        print(f"{code}: p*(bf) {p_bf:.5f}  p*(ms_hard) {p_mh:.5f}  "
              f"ratio {p_mh / p_bf:.2f}x", flush=True)

    header = (
        "# BSC flip-probability operating points at FER {t:g}, all nine codes\n"
        "# (tools/gen_bsc_thresholds.py on real TPU; fused kernels impl=auto;\n"
        "# multiplicative walk + log-log crossing; batch 8192, seed 0,\n"
        "# maxiters 50 bf / 100 ms_hard).\n"
        "# Columns: code,fer_target,p_star_bf,p_star_ms_hard,ratio\n"
    ).format(t=args.target)
    (RESULTS / "bsc_thresholds.csv").write_text(header + "\n".join(rows) + "\n")
    pts_header = (
        "# Probe points behind bsc_thresholds.csv.\n"
        "# Columns: code,surface,p,trials,data_bits,bit_errors,ber,"
        "frame_errors,fer\n"
    )
    (RESULTS / "bsc_threshold_points.csv").write_text(
        pts_header + "\n".join(points_log) + "\n"
    )
    print(f"wrote {len(rows)} rows to {RESULTS / 'bsc_thresholds.csv'}")


if __name__ == "__main__":
    main()
