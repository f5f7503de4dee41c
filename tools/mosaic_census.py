"""Instruction-level roofline: count the COMPILED kernel's vector ops.

The round-3 roofline (tools/roofline.py) counted JAX-level ops with zero
fusion credit, which left a 2x uncertainty band (a `jnp.where` was
counted as 4 element-ops; `x - 2*floor(x/2)` as 4; VERDICT r3 weak item
2). This tool counts at the MOSAIC MLIR level instead — the module JAX
hands to the TPU kernel compiler, extracted LOCALLY at lowering time via
`pallas_call(debug=True)` (no XLA dump flags needed, which this
environment swallows). At that level a select is ONE `arith.select`, a
compare ONE `arith.cmpf`, and every op carries its real vector shape, so
the census is exact per VPU issue slot up to (a) whatever the backend
further fuses into multi-op instructions (makes utilization look HIGHER
than reality, i.e. our number is an upper bound on required issue slots)
and (b) multi-vreg lane rotates (counted 1/vreg — a lower bound).

Method:
  * build the production decoder (factory args --code/--impl/--dtype),
    patch pl.pallas_call to debug=True, `jax.jit(decode).lower(llrs)` —
    lowering is local and does not dispatch to the TPU;
  * find the steady-state iteration: the single scf.while region of the
    kernel (iteration 0 is peeled OUTSIDE it by design, so the while body
    is exactly one iteration of the production loop);
  * count every op inside, weighted by vector registers: a
    vector<64x2048xf32> op issues ceil(64/8)*ceil(2048/128) = 128 vreg
    ops (8x128 f32 vregs); i1 masks and i32 vectors are lane-width-32
    too. Ops are bucketed: alu (arith/math), rotate (tpu.dynamic_rotate
    / tpu.rotate — the lane-permute unit), move (shape_cast / slice /
    concat / broadcast), mem (vector.load/store), reduce
    (vector.multi_reduction, counted as vregs — a lower bound for the
    log-depth lane tree).

Utilization = alu+rotate vreg-ops/iter/cw x measured cw*iter/s / (4
issue slots/cycle x clock). The 4-slot/clock model matches
tools/roofline.py's peak (8x128 lanes x 4 ALUs); v5e clock from the
published 197 bf16 TFLOPS / (4 MXUs x 128x128 x 2) = 1.50 GHz [0.94 and
1.56 GHz bracket kept for comparability with the r3 band].

Usage:
  python tools/mosaic_census.py --code TM8192 --impl pallas_layered
  python tools/mosaic_census.py --code TM8192 --impl pallas_layered \
      --rate 5.03e6        # cw*iter/s from the ms_iter bench row
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import math
import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

ALU_OPS = {
    "arith.addf", "arith.subf", "arith.mulf", "arith.divf",
    "arith.minimumf", "arith.maximumf", "arith.minf", "arith.maxf",
    "arith.cmpf", "arith.cmpi", "arith.select", "arith.andi", "arith.ori",
    "arith.xori", "arith.addi", "arith.subi", "arith.muli",
    "arith.extui", "arith.extsi", "arith.trunci", "arith.sitofp",
    "arith.fptosi", "arith.uitofp", "math.absf", "math.floor",
    "math.roundeven", "arith.negf",
}
ROTATE_OPS = {"tpu.dynamic_rotate", "tpu.rotate", "tpu.roll"}
MOVE_OPS = {
    "vector.extract_strided_slice", "vector.shape_cast", "tpu.concatenate",
    "vector.broadcast", "vector.extract", "vector.insert",
    "vector.insert_strided_slice", "tpu.repeat",
}
MEM_OPS = {
    "vector.load", "vector.store", "tpu.load", "tpu.store",
    "tpu.vector_store", "tpu.strided_load", "tpu.strided_store",
}
REDUCE_OPS = {"vector.multi_reduction", "tpu.all_reduce"}

_OP_RE = re.compile(r'(?:=\s+)?"?((?:arith|math|vector|tpu|scf)\.[a-z_0-9]+)"?\b')
_VEC_RE = re.compile(r"vector<(\d+)x(\d+)x(?:f32|bf16|i32|i16|i8|i1)>")


def _vregs(line: str) -> int:
    """Vector registers touched by one op line: from its LAST type
    annotation (the result type for arith/tpu ops; for stores the stored
    operand type). 8 sublanes x 128 lanes per vreg (32-bit lane width —
    Mosaic keeps i1/i8 computation in 32-bit lanes on v5e)."""
    shapes = _VEC_RE.findall(line)
    if not shapes:
        return 1  # scalar op
    a, b = (int(x) for x in shapes[-1])
    return math.ceil(a / 8) * math.ceil(b / 128)


def extract_mosaic_modules(build_decoder, example):
    """Lower the decoder with pallas debug printing patched on and return
    the captured text (kernel jaxpr + Mosaic module per pallas_call)."""
    import jax
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*a, **kw):
        kw.setdefault("debug", True)
        return orig(*a, **kw)

    pl.pallas_call = patched
    try:
        decode = build_decoder()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            jax.jit(decode).lower(example)
        return buf.getvalue()
    finally:
        pl.pallas_call = orig


def while_body(text: str) -> list[str]:
    """The (single) scf.while region of the Mosaic module = exactly one
    steady-state iteration (iteration 0 is peeled outside it)."""
    lines = text.splitlines()
    starts = [i for i, l in enumerate(lines) if "scf.while" in l]
    assert len(starts) == 1, f"expected one steady-state loop, found {len(starts)}"
    start = starts[0]
    depth = 0
    for i in range(start, len(lines)):
        depth += lines[i].count("{") - lines[i].count("}")
        if depth == 0 and i > start:
            return lines[start : i + 1]
    raise AssertionError("unbalanced scf.while region")


def census(body: list[str]) -> dict:
    buckets = {"alu": 0, "rotate": 0, "move": 0, "mem": 0, "reduce": 0}
    per_op: Counter = Counter()
    other: Counter = Counter()
    for line in body:
        m = _OP_RE.search(line)
        if not m:
            continue
        name = m.group(1)
        v = _vregs(line)
        if name in ALU_OPS:
            buckets["alu"] += v
        elif name in ROTATE_OPS:
            buckets["rotate"] += v
        elif name in MOVE_OPS:
            buckets["move"] += v
        elif name in MEM_OPS:
            buckets["mem"] += v
        elif name in REDUCE_OPS:
            buckets["reduce"] += v
        else:
            if name.split(".")[0] in ("arith", "math", "vector", "tpu"):
                other[name] += v
            continue
        per_op[name] += v
    return {"buckets": buckets, "per_op": dict(per_op), "unclassified": dict(other)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", default="TM8192")
    ap.add_argument("--impl", default="pallas_layered",
                    choices=["pallas_layered", "pallas_qc", "pallas_bf",
                             "pallas_sp"])
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--rate", type=float, default=None,
                    help="measured cw*iter/s (ms_iter / bf_iter row) for "
                         "utilization")
    ap.add_argument("--dump", default=None, help="save the Mosaic text here")
    args = ap.parse_args()

    import jax.numpy as jnp

    from labrador_ldpc_tpu.codes.params import get_code
    from labrador_ldpc_tpu.ops.pallas_qc import (
        make_ms_decoder_pallas_layered,
        make_ms_decoder_pallas_qc,
    )
    from labrador_ldpc_tpu.ops.routing import route_for
    from labrador_ldpc_tpu.codes.expand import qc_structure

    code = get_code(args.code)
    s = qc_structure(code)
    route = route_for(code)
    # B must be the PRODUCTION kernel's own batch tile: the decode wrapper
    # pads the input to a tile multiple, so the while body always operates
    # on whole tiles — normalizing by anything else mis-states per-cw
    # counts. (Round-4 regression: using the lane-major default for the
    # node-major TM1280 kernel, whose tile is 2x larger, overstated its
    # slots/cw by 2x and with it the "~95% of issue peak" claim; the
    # corrected figure is in STATUS.md.) The tiles come straight off the
    # routing table, so the census always matches production dispatch.
    if args.impl == "pallas_bf":
        from labrador_ldpc_tpu.ops.pallas_bf import make_bf_decoder_pallas

        B = route.bf_batch_tile
        example = jnp.zeros((B, code.n), jnp.uint8)
        text = extract_mosaic_modules(
            lambda: make_bf_decoder_pallas(code, maxiters=50), example
        )
    elif args.impl == "pallas_sp":
        from labrador_ldpc_tpu.ops.pallas_sp import make_sp_decoder_pallas

        B = route.ms_batch_tile  # the SP kernel reuses the ms route tile
        llrs = jnp.ones((B, code.n), jnp.float32)
        text = extract_mosaic_modules(
            lambda: make_sp_decoder_pallas(code, maxiters=50), llrs
        )
    else:
        B = route.ms_batch_tile
        factory = (
            make_ms_decoder_pallas_layered
            if args.impl == "pallas_layered"
            else make_ms_decoder_pallas_qc
        )
        dtype = jnp.dtype(args.dtype)
        llrs = jnp.ones(
            (B, code.n), jnp.float32 if dtype.name.startswith("int") else dtype
        )
        text = extract_mosaic_modules(
            lambda: factory(code, dtype, maxiters=50), llrs
        )
    if args.dump:
        Path(args.dump).write_text(text)
    body = while_body(text)
    c = census(body)
    b = c["buckets"]
    issue = b["alu"] + b["rotate"] + b["reduce"]  # ops needing a VPU slot
    per_cw = {k: v / B for k, v in b.items()}
    out = {
        "code": code.name,
        "impl": args.impl,
        "dtype": args.dtype,
        "batch_tile": B,
        "vreg_ops_per_iter_per_tile": b,
        "vreg_ops_per_iter_per_cw": per_cw,
        "issue_slots_per_iter_per_cw": issue / B,
        "element_ops_per_iter_per_cw": issue / B * 1024,
        "per_op": c["per_op"],
        "unclassified": c["unclassified"],
    }
    if args.rate:
        # peak: 4 issue slots/cycle (8x128 lanes x 4 ALUs / 1024-lane vreg)
        for clock in (0.94e9, 1.50e9, 1.56e9):
            peak = 4 * clock
            util = (issue / B) * args.rate / peak
            out[f"utilization_at_{clock/1e9:.2f}GHz"] = round(util, 3)
        out["measured_cw_iter_per_s"] = args.rate
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
