"""Measure the BF-vs-MS gap at FER 1e-3 for ALL NINE codes (round 5).

Extends the TC512/TM8192 deep-curve study (tools/gen_bf_curves.py) to
the whole family with an adaptive walk instead of hand-tuned grids: for
each (code, surface) the Eb/N0 axis is walked in 0.25 dB steps from a
known-high-FER start until FER drops below the target, then the crossing
is log-linearly interpolated from the bracketing pair (both measured
with enough trials for >= ~60 frame errors at the target).

Surfaces per code (all on the fused production kernels, impl=auto):
  ms      — min-sum f32, soft AWGN LLRs (the production soft path)
  ms_hard — min-sum f32 on hard-sliced channel output (+-1 LLRs)
  bf      — bit-flip on the same hard-sliced channel

Gap decomposition at matched channel (src/lib.rs:165-172's claim):
  delta_total = bf - ms          (what a user switching surfaces pays)
  delta_alg   = bf - ms_hard     (the reference's "one to two dB")
  delta_hard  = ms_hard - ms     (soft-information loss of the slice)

Writes benchmarks/results/bf_ms_gap_table.csv (summary, one row per
code) and bf_ms_gap_points.csv (every measured probe point, for curve
reconstruction). Run on the real TPU: python tools/gen_gap_table.py
[--codes TC128,...] [--target 1e-3]
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

# start of the walk: the mid-waterfall BER-anchor region per code (FER
# 1e-1..1e-2 there — tests/test_ber_regression.CASES), minus margin
MS_START = {
    "TC128": 1.0, "TC256": 0.8, "TC512": 0.8,
    "TM1280": 2.2, "TM1536": 1.4, "TM2048": 0.8,
    "TM5120": 2.0, "TM6144": 1.2, "TM8192": 0.8,
}

STEP = 0.25
BATCH = 8192


# surface -> (waterfall decoder, impl, maxiters). "sp" is the flooding
# sum-product yardstick (ops/sumproduct.py; true-LLR scaling handled by
# the trial step); "ms_flood" is the reference's own flooding
# self-corrected min-sum on the fused kernel.
SURFACES = {
    "ms": ("ms", "auto", 100),
    "ms_hard": ("ms_hard", "auto", 100),
    "bf": ("bf", "auto", 50),
    "sp": ("ms", "sp", 100),
    "ms_flood": ("ms", "pallas_qc", 100),
}


def fer_at(code, surface, db, trials, points_log):
    from labrador_ldpc_tpu.channel.waterfall import waterfall

    decoder, impl, maxiters = SURFACES[surface]
    k = {"TC128": 64, "TC256": 128, "TC512": 256, "TM1280": 1024,
         "TM1536": 1024, "TM2048": 1024, "TM5120": 4096, "TM6144": 4096,
         "TM8192": 4096}[code]
    (p,) = waterfall(
        code, [db], batch=BATCH, maxiters=maxiters,
        max_bits=trials * k, max_bit_errors=10**9,
        noise_model="ebn0", decoder=decoder, impl=impl, seed=0,
    )
    points_log.append(
        f"{code},{surface},{db},{p.trials},{p.bits},{p.bit_errors},"
        f"{p.ber:.6e},{p.frame_errors},{p.fer:.6e}"
    )
    print(f"  {code:7} {surface:8} {db:5.2f} dB  FER {p.fer:.3e} "
          f"({p.frame_errors}/{p.trials})", flush=True)
    return p.fer


def cross_db(code, surface, target, points_log, fer_fn=None, start=None,
             advance=None, retreat=None, interp=None):
    """Walk toward the target FER; interpolate the crossing.

    Generic over the sweep axis (round-5 review dedup — the BSC
    threshold walker reuses this with a multiplicative p step and
    log-x interpolation): `advance(x)` moves toward LOWER FER,
    `retreat(x)` jumps back ~4 steps when the start overshot,
    `interp(x0, x1, t)` maps the log-FER crossing fraction t onto the
    axis. Defaults are the additive 0.25 dB Eb/N0 walk."""
    fer_fn = fer_fn or fer_at
    x = (start if start is not None
         else MS_START[code] + (0.0 if surface == "ms" else 1.0))
    advance = advance or (lambda v: v + STEP)
    retreat = retreat or (lambda v: v - 4 * STEP)
    interp = interp or (lambda x0, x1, t: x0 + t * (x1 - x0))
    trials = BATCH  # coarse while FER is large
    last = None
    for _ in range(60):
        # enough trials for ~60 FE at the CURRENT expected magnitude
        fer = fer_fn(code, surface, round(x, 6), trials, points_log)
        if fer < target:
            if last is None:  # started below target — walk back up
                x = retreat(x)
                continue
            (x0, f0) = last
            if fer <= 0.0:
                # no errors observed: re-measure with 8x trials once
                fer = fer_fn(code, surface, round(x, 6), trials * 8,
                             points_log)
                if fer <= 0.0:
                    return x0  # conservative
            t = (math.log(target) - math.log(f0)) / (math.log(fer) - math.log(f0))
            return interp(x0, x, t)
        last = (x, fer)
        x = advance(x)
        # keep >= ~60 expected FE at the NEXT point (assume ~4x drop/step)
        want = int(60 / max(fer / 4.0, target))
        trials = min(max(BATCH, (want // BATCH + 1) * BATCH), 96 * BATCH)
    raise RuntimeError(f"no crossing found for {code}/{surface}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--codes", default=None)
    ap.add_argument("--target", type=float, default=1e-3)
    args = ap.parse_args()
    codes = args.codes.split(",") if args.codes else list(MS_START)

    points_log: list[str] = []
    rows = []
    for code in codes:
        res = {}
        for surface in ("ms", "ms_hard", "bf"):
            res[surface] = cross_db(code, surface, args.target, points_log)
        rows.append(
            f"{code},{args.target:g},{res['bf']:.2f},{res['ms_hard']:.2f},"
            f"{res['ms']:.2f},{res['bf'] - res['ms']:.2f},"
            f"{res['bf'] - res['ms_hard']:.2f},"
            f"{res['ms_hard'] - res['ms']:.2f}"
        )
        print(f"{code}: bf {res['bf']:.2f} / ms_hard {res['ms_hard']:.2f} / "
              f"ms {res['ms']:.2f} dB -> total {res['bf']-res['ms']:.2f} = "
              f"alg {res['bf']-res['ms_hard']:.2f} + hard "
              f"{res['ms_hard']-res['ms']:.2f}", flush=True)

    header = (
        "# BF-vs-MS Eb/N0 gap at FER {t:g}, all nine codes (tools/gen_gap_table.py\n"
        "# on real TPU; fused kernels impl=auto; AWGN ebn0 channel, hard surfaces\n"
        "# sliced; adaptive 0.25 dB walk + log-linear crossing; batch 8192, seed 0).\n"
        "# Columns: code,fer_target,bf_db,ms_hard_db,ms_db,delta_total_db,"
        "delta_alg_db,delta_hard_db\n"
    ).format(t=args.target)
    (RESULTS / "bf_ms_gap_table.csv").write_text(header + "\n".join(rows) + "\n")
    pts_header = (
        "# Probe points behind bf_ms_gap_table.csv.\n"
        "# Columns: code,surface,ebn0_db,trials,data_bits,bit_errors,ber,"
        "frame_errors,fer\n"
    )
    (RESULTS / "bf_ms_gap_points.csv").write_text(
        pts_header + "\n".join(points_log) + "\n"
    )
    print(f"wrote {len(rows)} rows to {RESULTS / 'bf_ms_gap_table.csv'}")


if __name__ == "__main__":
    main()
