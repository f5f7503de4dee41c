"""Explicit per-code kernel routing table (VERDICT r4 item 5).

Every production dispatch decision the Pallas factories make — which
layout family a code decodes in, whether the lane-major min-sum kernel
carries its planes as quartered lane parts, and the batch tile each
kernel family runs at — is recorded HERE, per code, as a measured value.
Nothing in this table is derived from (M, sumA) fingerprints at dispatch
time: a new code (or an edited prototype) hits `route_for`'s KeyError and
must be measured and added explicitly instead of silently inheriting a
tile or variant that was measured for a different code
(`tests/test_routing.py` pins every entry).

Measurement provenance (all single v5e core; full rows in
benchmarks/results.jsonl):

* Layout boundary (ms_layout / bf_layout): M <= 256 decodes node-major
  (ops/pallas_tc.py — TC sublane rolls, quartered pi parts for
  TM1280/TM1536: ms 1.8-2.1x, bf 1.8-3.1x their lane-major kernels);
  M >= 512 decodes lane-major (ops/pallas_qc.py / pallas_bf.py — the
  node-major layout measured 0.85-0.94x there and TM8192 0.70M vs 1.80M
  cw/s: tall (q, B) parts pay more per sublane roll than the wide lane
  layout pays for its pi slices).
* ms_lane_parts: the quartered LANE-parts carriage of the lane-major
  min-sum kernels measured +16-21% on TM2048 (3.99-4.15M vs 3.44M cw/s)
  but flat on TM8192, -7% on TM5120 and -38% on TM6144 (steady-state
  iteration rates flat throughout — the unrolled loop is
  scheduling-bound, not issue-slot-bound, so deleting the concat
  movement ops only pays where per-tile scheduling was the bottleneck).
  Gated to the one measured winner.
* ms_batch_tile — node-major (layered f32 sweeps): 512 wins for all
  three TC codes (TC128 9.4M, TC256 9.0M, TC512 7.1M cw/s; larger tiles
  lose to VMEM/pipelining pressure, >= 4096 can fail to compile);
  TM1280/TM1536 best at 256 (4.0M / 3.6M; 128 and 512 lose).
  Lane-major (tools/bench_pallas_qc.py steady-state probe): TM2048 256
  (7.80M; 64: 3.88M, 512: 5.87M), TM5120 128 (2.62M; 256 fails to
  compile), TM6144 128 (2.16M; 256 fails to compile), TM8192 64 (1.74M;
  128: 1.47M — VMEM/pipelining pressure).
* bf_batch_tile — node-major (maxiters=50, 3-bit-flip, B=32768
  pipelined): TC128 1024 (6.6M), TC256 512 (8.5M), TC512 1024 (7.4M);
  TM1280/TM1536 256 (6.60M / 6.35M; 512: 6.43/6.14, 1024: 6.07/5.45).
  Lane-major: TM2048/TM5120 256 (5.42M/2.18M; 128: 5.12M/2.04M),
  TM6144 128 (1.99M; 256 ties), TM8192 128 (1.84M; 64: 1.80M,
  256: 1.78M).

bf16 storage keeps the f32 tiles (a storage-aware 2x tile measured a
LOSS on the heavy codes — issue/pipelining bound, not VMEM bound); dtype
guidance lives in docs/API.md.

* ms_recompute_u (round-5 A/B, /tmp-protocol in STATUS.md): dropping the
  per-edge u planes (sumA -> 3R stat planes; TM5120 39 -> 9) and
  recomputing u from t' + stats measured a LOSS on every lane-major code
  — headline -0.5..-4.4%, steady state -4.5..-7.2% (TM8192/TM6144/
  TM5120/TM2048) — so neither issue slots (the round-4 parts
  falsification) nor VMEM traffic/capacity is the binding constraint;
  the Mosaic scheduling-bound diagnosis stands. Default False for every
  code; the variant stays available (bit-exact, pinned) for future
  hardware where the trade may flip.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..codes.params import LDPCCode, get_code

__all__ = ["KernelRoute", "ROUTES", "route_for"]

NODE_MAJOR = "node_major"
LANE_MAJOR = "lane_major"


@dataclass(frozen=True)
class KernelRoute:
    """Measured-best production kernel configuration for one code."""

    ms_layout: str  # node_major (ops/pallas_tc) | lane_major (ops/pallas_qc)
    ms_batch_tile: int  # codewords per grid step, min-sum kernels
    ms_lane_parts: bool  # lane-major only: quartered lane-parts carriage
    bf_layout: str  # node_major (ops/pallas_tc) | lane_major (ops/pallas_bf)
    bf_batch_tile: int  # codewords per grid step, bit-flip kernels
    # lane-major layered only: drop the per-edge u planes and recompute
    # the previous iteration's u from t' + per-layer stats (round-5
    # experiment; default False until a code measures a win)
    ms_recompute_u: bool = False


ROUTES: dict[str, KernelRoute] = {
    # TC codes (M = 16/32/64): transposed node-major kernels, batch on lanes
    "TC128": KernelRoute(NODE_MAJOR, 512, False, NODE_MAJOR, 1024),
    "TC256": KernelRoute(NODE_MAJOR, 512, False, NODE_MAJOR, 512),
    "TC512": KernelRoute(NODE_MAJOR, 512, False, NODE_MAJOR, 1024),
    # small-M TM codes: quartered node-major pi-part kernels
    "TM1280": KernelRoute(NODE_MAJOR, 256, False, NODE_MAJOR, 256),
    "TM1536": KernelRoute(NODE_MAJOR, 256, False, NODE_MAJOR, 256),
    # large-M TM codes: lane-major kernels; TM2048 alone carries its
    # planes as quartered lane parts (the one measured lane-parts winner)
    "TM2048": KernelRoute(LANE_MAJOR, 256, True, LANE_MAJOR, 256),
    "TM5120": KernelRoute(LANE_MAJOR, 128, False, LANE_MAJOR, 256),
    "TM6144": KernelRoute(LANE_MAJOR, 128, False, LANE_MAJOR, 128),
    "TM8192": KernelRoute(LANE_MAJOR, 64, False, LANE_MAJOR, 128),
}


def route_for(code: LDPCCode | str) -> KernelRoute:
    """The measured production route for `code`. Fails loudly for a code
    with no measured entry — measure (tile sweep + lane-parts A/B, see the
    module docstring protocols) and add a ROUTES row; do NOT guess."""
    name = get_code(code).name
    try:
        return ROUTES[name]
    except KeyError:
        raise KeyError(
            f"no measured kernel route for code {name!r}: run the batch-tile "
            f"sweep (tools/bench_pallas_qc.py) and the lane-parts A/B for it, "
            f"then add an explicit entry to ops/routing.ROUTES — routing must "
            f"never inherit another code's measurements"
        ) from None
