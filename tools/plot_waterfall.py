#!/usr/bin/env python
"""Plot BER waterfall curves from the CLI's CSV output.

Counterpart of the reference's perftest/plot.py:5-12 (semilog-y BER vs SNR),
reading the same CSV schema `code,snr,trials,bits,errors,ber` from files or
stdin:

    python -m labrador_ldpc_tpu waterfall --code TC512 > tc512.csv
    python tools/plot_waterfall.py tc512.csv -o tc512.png
"""

from __future__ import annotations

import argparse
import sys
from collections import defaultdict


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("csv", nargs="*", help="CSV files (default: stdin)")
    ap.add_argument("-o", "--out", default="waterfall.png")
    args = ap.parse_args()

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib not available in this environment", file=sys.stderr)
        return 1

    series = defaultdict(list)  # label -> [(snr, ber)]
    handles = [open(f) for f in args.csv] if args.csv else [sys.stdin]
    for fh in handles:
        for line in fh:
            parts = line.strip().split(",")
            if len(parts) < 6 or parts[0].lower() == "code":
                continue
            code, snr, ber = parts[0], float(parts[1]), float(parts[5])
            label = code
            if len(handles) > 1 and fh is not sys.stdin:
                # disambiguate same-code curves from different files (e.g.
                # impl/dtype variants) by the filename stem
                from pathlib import Path

                stem = Path(fh.name).stem.replace("waterfall_", "")
                label = f"{code} [{stem}]" if stem.lower() != code.lower() else code
            series[label].append((snr, ber))

    fig, ax = plt.subplots(figsize=(7, 5))
    for code, pts in sorted(series.items()):
        pts.sort()
        ax.semilogy([s for s, _ in pts], [max(b, 1e-12) for _, b in pts],
                    marker="o", label=code)
    ax.set_xlabel("SNR (dB)")
    ax.set_ylabel("BER")
    ax.grid(True, which="both", alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
