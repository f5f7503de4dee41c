"""Measure — not infer — the TM8192 headline kernel's per-grid-step cost
(VERDICT r4 item 1).

Round-4's fixed-cost breakdown (tools/fixed_cost.py) attributed the
~1.7 ms remainder of the 3.10 ms per-dispatch fixed cost to "per-grid-step
pipeline overhead (~6-7 us x 256 steps)" — a subtraction, not a
measurement. Two direct experiments:

1. MINIMAL-KERNEL floor: a kernel with the headline config's exact
   grid/BlockSpec/scratch shapes but a near-empty body (one read + one
   write per block), timed at several batch tiles (step counts). The
   slope of time vs #grid-steps is the pipeline's per-step cost with no
   compute to hide it.

2. REAL-KERNEL sub-tile scan: the production TM8192 layered kernel run
   with subtiles=S in {1, 2, 4} (make_ms_decoder_pallas_layered) — S
   sequential bt=64 sub-tiles per grid step, so the grid shrinks S-fold
   at CONSTANT per-sub-tile VMEM (scratch reused across sub-tiles; this
   is NOT the bt=128 single-tile config, whose doubled scratch loses 15%
   to VMEM pressure). Timed on the headline 3-flip protocol AND on the
   fixed-cost protocol (pure noise, maxiters in {1,2,4,8} least-squares
   -> fixed + per-iteration split per S). If the attribution is right,
   fixed(S) drops by ~(1 - 1/S) * steps * per-step-cost while the
   per-iteration slope stays flat.

Run on the real TPU: python tools/grid_step_cost.py [--quick]
Results are printed as one JSON line per measurement (also readable as a
log); STATUS.md records the round-5 numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B_TOTAL = 16384
N = 8192
V = 10240


from labrador_ldpc_tpu.utils.timing import pipelined_slope  # noqa: E402


def timed_per_dispatch(fn, arg, sync, k=64, reps=3):
    """Shared pipelined-slope protocol (labrador_ldpc_tpu.utils.timing —
    a two-point difference measured NEGATIVE values for ~1 ms dispatches
    through this tunnel, hence the 4-point fit)."""
    return pipelined_slope(fn, arg, sync, k=k, reps=reps)


def minimal_kernel_scan(bts):
    """The headline grid/BlockSpec/scratch structure with a trivial body."""
    from labrador_ldpc_tpu.sizes import ms_layered_scratch_specs

    sumA = 15  # TM8192 prototype addend count (qc_structure)
    M = 2048
    results = []
    for bt in bts:
        def kernel(llr_ref, bits_ref, done_ref, iters_ref, *scratch):
            # force the input DMA to matter and produce real outputs, but
            # do (almost) no compute: one reduction + broadcast stores
            s = jnp.sum(llr_ref[:, :128], axis=1, keepdims=True)
            done_ref[...] = (s * 0.0) + 1.0
            iters_ref[...] = jnp.zeros_like(iters_ref)
            bits_ref[:, :128] = jnp.zeros_like(bits_ref[:, :128])

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B_TOTAL // bt,),
            in_specs=[pl.BlockSpec((bt, N), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((bt, V), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM(sh, dt)
                for sh, dt in ms_layered_scratch_specs(
                    sumA, V, M, 64, jnp.dtype(jnp.float32), node_major=False
                )
            ],
        )
        call = pl.pallas_call(
            kernel,
            out_shape=[
                jax.ShapeDtypeStruct((B_TOTAL, V), jnp.uint8),
                jax.ShapeDtypeStruct((B_TOTAL, 1), jnp.float32),
                jax.ShapeDtypeStruct((B_TOTAL, 1), jnp.int32),
            ],
            grid_spec=gs,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )
        fn = jax.jit(lambda x, c=call: c(x))
        llrs = jax.device_put(jnp.ones((B_TOTAL, N), jnp.float32))
        out = fn(llrs)
        jax.block_until_ready(out)
        sec = timed_per_dispatch(fn, llrs, lambda o: np.asarray(o[1][:8]))
        steps = B_TOTAL // bt
        row = {
            "experiment": "minimal_kernel",
            "bt": bt,
            "steps": steps,
            "ms_per_dispatch": round(sec * 1e3, 4),
        }
        print(json.dumps(row), flush=True)
        results.append((steps, sec))
    # least-squares slope: seconds per grid step
    xs = np.array([s for s, _ in results], np.float64)
    ys = np.array([t for _, t in results], np.float64)
    slope = float(((xs - xs.mean()) * (ys - ys.mean())).sum()
                  / ((xs - xs.mean()) ** 2).sum())
    intercept = float(ys.mean() - slope * xs.mean())
    print(json.dumps({
        "experiment": "minimal_kernel_fit",
        "us_per_grid_step": round(slope * 1e6, 3),
        "intercept_ms": round(intercept * 1e3, 4),
    }), flush=True)
    return slope


def real_kernel_scan(subtiles_list, quick=False):
    from labrador_ldpc_tpu.codes.params import get_code
    from labrador_ldpc_tpu.ops.convert import hard_to_llrs
    from labrador_ldpc_tpu.ops.encoder import encode
    from labrador_ldpc_tpu.ops.pallas_qc import make_ms_decoder_pallas_layered

    code = get_code("TM8192")
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, (B_TOTAL, code.k // 8), dtype=np.uint8)
    cw = np.array(encode(code, jnp.asarray(data)))
    cw[:, 0] ^= (1 << 7) | (1 << 5) | (1 << 3)
    llrs_flip = jax.device_put(hard_to_llrs(jnp.asarray(cw), jnp.float32))
    noise = jax.device_put(
        jnp.asarray(rng.normal(0.0, 1.0, (B_TOTAL, code.n)), jnp.float32)
    )

    for S in subtiles_list:
        # headline protocol (3-flip early-exit, maxiters=50)
        dec = make_ms_decoder_pallas_layered(
            code, jnp.float32, maxiters=50, subtiles=S
        )
        res = dec(llrs_flip)
        assert bool(np.asarray(res.success).all()), f"S={S} must converge"
        sec = timed_per_dispatch(dec, llrs_flip,
                                 lambda o: np.asarray(o.success), k=32)
        print(json.dumps({
            "experiment": "headline_3flip",
            "subtiles": S,
            "grid_steps": 256 // S,
            "ms_per_dispatch": round(sec * 1e3, 4),
            "cw_per_s": round(B_TOTAL / sec, 1),
        }), flush=True)

        # fixed-cost protocol: pure noise, fixed-iteration fit
        ms_list = [1, 2, 4] if quick else [1, 2, 4, 8]
        ts = []
        for m in ms_list:
            d = make_ms_decoder_pallas_layered(
                code, jnp.float32, maxiters=m, subtiles=S
            )
            r = d(noise)
            jax.block_until_ready(r.bits)
            ts.append(timed_per_dispatch(d, noise,
                                         lambda o: np.asarray(o.success),
                                         k=32))
        xs = np.array(ms_list, np.float64)
        ys = np.array(ts, np.float64)
        slope = float(((xs - xs.mean()) * (ys - ys.mean())).sum()
                      / ((xs - xs.mean()) ** 2).sum())
        fixed = float(ys.mean() - slope * xs.mean())
        print(json.dumps({
            "experiment": "fixed_cost_fit",
            "subtiles": S,
            "grid_steps": 256 // S,
            "fixed_ms": round(fixed * 1e3, 4),
            "ms_per_iteration": round(slope * 1e3, 4),
            "points_ms": [round(t * 1e3, 4) for t in ts],
        }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip-minimal", action="store_true")
    ap.add_argument("--subtiles", type=int, nargs="*", default=[1, 2, 4])
    args = ap.parse_args()
    if not args.skip_minimal:
        minimal_kernel_scan([256, 128, 64, 32] if not args.quick else [128, 64])
    real_kernel_scan(args.subtiles, quick=args.quick)


if __name__ == "__main__":
    main()
