"""Quantified VPU roofline for the Pallas min-sum kernels.

SUPERSEDED as the primary instrument by tools/mosaic_census.py (round 4),
which counts the COMPILED Mosaic module's issue slots instead of this
tool's zero-fusion JAX-level ops — the census confirmed this tool's count
to within 0.5% but collapses the 77-127% utilization band to one number
per kernel (STATUS.md roofline section). Kept for the measured
calibration-kernel lower bounds (step 1), which the census cannot provide.

Makes the "speed-of-light" claim falsifiable (STATUS.md roofline section):

  1. MEASURE a calibration Pallas kernel's sustained f32 element-op rate
     (fori_loop of dependent elementwise chains, ILP swept over chain
     counts, the decoder's op mix: mul/add/abs/min/cmp/select) and the
     lane-roll rate (pltpu.roll is the decoder's only data motion). These
     are LOWER bounds on the issue peak — dependency chains cannot fill
     the pipe the way the decoder's unrolled independent addends do.
  2. COUNT the production layered kernel's vector element-ops per iteration
     per codeword by walking the unrolled body (ops/pallas_qc.py
     `make_ms_decoder_pallas_layered`) over the code's qc_structure
     (zero-fusion JAX-level count: FMA/cmp-select fusion makes the actual
     hardware op count lower).
  3. MEASURE the steady-state decode rate (cw*iter/s, pure-noise LLRs,
     fixed iteration budget) and report the effective counted-op rate
     against the calibration rates AND the theoretical v5e VPU issue peak
     (8x128 lanes x 4 ALUs at 0.94-1.56 GHz clock estimates).

Run on the real TPU:  timeout 570 python tools/roofline.py [--code TM8192]

The per-addend op counts in `count_layered_ops` are derived line-by-line
from the kernel body; if the kernel changes, re-derive (each constant is
annotated with the statement it counts).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from labrador_ldpc_tpu.codes.expand import qc_structure
from labrador_ldpc_tpu.codes.params import get_code


def _bench(fn, x, rep=3):
    np.asarray(fn(x))  # compile + settle
    t0 = time.perf_counter()
    for _ in range(rep):
        out = fn(x)
    np.asarray(out)  # one blocking fetch after rep async dispatches
    return (time.perf_counter() - t0) / rep


def _measure_loop(make_kernel, B, M, elems_per_step):
    """Two-stage auto-K timing: run a 200k-step probe to estimate the
    per-step cost, then rebuild with K sized for ~0.5 s of kernel time so
    the ~30-45 ms tunnel round trip is noise. (The round-4 audit found the
    original fixed K=500 made every calibration dispatch-dominated — the
    'measured' rates were the tunnel, understating the true sustained
    rates ~5x. Rates below are kernel-time-dominated.) Returns
    element-units/s."""

    def build(K):
        x = jnp.ones((B, M), jnp.float32)
        return jax.jit(
            pl.pallas_call(
                make_kernel(K),
                out_shape=jax.ShapeDtypeStruct((B, M), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
        ), x

    K1 = 200_000
    fn, x = build(K1)
    dt1 = _bench(fn, x, rep=1)
    per_step = max((dt1 - 0.035) / K1, 1e-10)  # subtract ~one round trip
    K2 = min(max(K1, int(0.5 / per_step)), 400_000_000)
    if K2 > K1 * 2:
        fn, x = build(K2)
        dt = _bench(fn, x)
    else:
        K2, dt = K1, dt1
    return elems_per_step * K2 / dt


def measure_vpu_peak(M=2048, chains=8, B=None):
    """Sustained f32 elementwise rate (element-ops/s) with the decoder's op
    mix and `chains` independent dependency chains (ILP), state
    VMEM-resident. Each chain is latency-bound by construction, so the
    sustained rate RISES with chains until the VPU's issue width saturates
    — main() sweeps chains and takes the max as the peak estimate. B is
    sized so ~6 live temporaries per chain fit the 16 MB scoped-VMEM
    stack."""
    if B is None:
        B = max(8, 256 // chains)
    OPS = 13 * chains  # ops per K-step per element (counted in `body`)

    def make_kernel(K):
        def kernel(x_ref, o_ref):
            def body(i, accs):
                outs = []
                for a0 in accs:  # 13 element-ops per chain per step
                    a = a0 * 1.0001 + 0.5          # 2 (mul, add; may fuse)
                    b = jnp.abs(a) - 0.25          # 2
                    c = jnp.minimum(a, b)          # 1
                    d = jnp.where(b < a, c + 1.0, c - 1.0)  # 4 (cmp, +, -, sel)
                    e = jnp.maximum(d, -d)         # 2
                    outs.append(d + e * 0.5)       # 2
                return tuple(outs)

            init = tuple(x_ref[:] + float(i) for i in range(chains))
            res = jax.lax.fori_loop(0, K, body, init)
            acc = res[0]
            for r in res[1:]:
                acc = acc + r
            o_ref[:] = acc

        return kernel

    rate = _measure_loop(make_kernel, B, M, B * M * OPS)
    print(f"vpu calibration-mix rate ({B},{M}, ilp{chains}): "
          f"{rate/1e12:.2f} T element-ops/s f32")
    return rate


def _roll_kernel(chains, axis):
    def make_kernel(K):
        def kernel(x_ref, o_ref):
            def body(i, accs):
                return tuple(
                    pltpu.roll(a, 3 + j, axis=axis) for j, a in enumerate(accs)
                )

            init = tuple(x_ref[:] + float(i) for i in range(chains))
            res = jax.lax.fori_loop(0, K, body, init)
            acc = res[0]
            for r in res[1:]:
                acc = acc + r
            o_ref[:] = acc

        return kernel

    return make_kernel


def measure_roll_peak(M=2048, chains=8, B=None):
    """Sustained full-width LANE-roll rate (element-moves/s); same
    ILP-sweep rationale as measure_vpu_peak."""
    if B is None:
        B = max(8, 512 // chains)
    rate = _measure_loop(_roll_kernel(chains, axis=1), B, M, B * M * chains)
    print(f"lane-roll rate ({B},{M}, ilp{chains}): "
          f"{rate/1e12:.2f} T element-moves/s f32")
    return rate


def measure_subroll_peak(S=32, L=256, chains=4):
    """Sustained SUBLANE-roll rate on the node-major parts shape (the
    (q, B) quarter planes of ops/pallas_tc.py). Comparing this against
    measure_vpu_peak on the same shape prices a sublane roll in ALU-slot
    equivalents — round-4 measurement: ~3-4 ALU vreg-slots per rolled
    vreg, which is why the census (1 slot/vreg for rotates) understates
    the node-major kernels' true port pressure (STATUS.md roofline)."""
    rate = _measure_loop(_roll_kernel(chains, axis=0), S, L, S * L * chains)
    print(f"sublane-roll rate ({S},{L}, ilp{chains}): "
          f"{rate/1e12:.3f} T element-moves/s f32")
    return rate


def _perm_moves(perm, M: int, inverse: bool) -> float:
    """Element-moves (per codeword, M-element planes) for one static block
    permutation in _static_perm_fns (slice form, M >= 256): a rot is one
    full-width roll (0 if the shift is 0 — identity HI addends are free);
    a pi permutation is 4 quarter rolls (M elements total) + the theta
    whole-block roll + the concat copy (~M)."""
    if perm.kind == "rot":
        sh = perm.shift % M
        return 0.0 if sh == 0 else 1.0
    return 3.0  # 4x M/4 quarter rolls + whole-block theta roll + concat copy


def count_layered_ops(code) -> dict:
    """Element-ops and element-moves per ITERATION per CODEWORD for the
    layered Pallas kernel's general (non-peeled) body, walking the same
    qc_structure the kernel unrolls over. Counts are per M-element plane
    (x M at the end). Derived from ops/pallas_qc.py kernel body:

    pass 1 (per addend):   g=fwd_perm(va)      -> moves
                           t = g - u           -> 1
                           self-correction     -> 6 (2 cmp==, 2 cmp<, or, where)
    two-min (per addend):  a1=|t|              -> 1
                           is_new = a1<m1      -> 1
                           m2 = where(.., min) -> 2
                           m1 = min            -> 1
                           sgc += (t<0)        -> 3 (cmp, cast, add)
    per layer:             sg = mod2(sgc)      -> 4 (mul, floor, mul, sub)
    pass 2 (per addend):   mag = where(a1==m1) -> 2
                           neg = xor(sg!=0,t<0)-> 3
                           u = where(neg,-mag) -> 2
                           du = u - u_old      -> 1
                           inv_perm(du)        -> moves
                           va += du            -> 1
                           store u, t'         -> 2
    syndrome:  sign planes (per col)           -> 2 (cmp, cast)
               per addend: par += fwd_perm(s)  -> 1 + moves
               per layer:  mod2 + min-reduce   -> 4 + 2
    freeze (per V-element): newly/where/iters  -> ~6 on (B,V) planes
    """
    s = qc_structure(code)
    M, R, Cc = s.m, s.n_block_rows, s.n_block_cols
    ops = 0.0  # element-ops on M-planes
    moves = 0.0  # element-moves on M-planes
    for row in s.rows:
        for perm in row:
            ops += 7.0  # pass 1 arithmetic
            ops += 8.0  # two-min + sign count
            ops += 11.0  # pass 2 arithmetic + stores
            ops += 1.0  # syndrome par accumulate
            moves += _perm_moves(perm, M, inverse=False)  # pass 1 fwd
            moves += _perm_moves(perm, M, inverse=True)  # pass 2 inv
            moves += _perm_moves(perm, M, inverse=False)  # syndrome fwd
        ops += 4.0 + 4.0 + 2.0  # per-layer sg mod2, syndrome mod2+reduce
    ops += Cc * 2.0  # sign planes
    ops += Cc * 6.0  # freeze bookkeeping on (B, V)
    return {
        "element_ops": ops * M,
        "element_moves": moves * M,
        "M": M,
        "R": R,
        "Cc": Cc,
        "sumA": sum(len(r) for r in s.rows),
    }


def measure_ms_iter(code, impl_dtype=jnp.float32, batch=16384, iters=20):
    """Steady-state layered kernel rate: pure-noise LLRs, fixed budget."""
    from labrador_ldpc_tpu.ops.pallas_qc import make_ms_decoder_pallas_layered

    rng = np.random.default_rng(0)
    noise = jax.device_put(
        jnp.asarray(rng.standard_normal((batch, code.n)), impl_dtype)
    )
    dec = make_ms_decoder_pallas_layered(code, impl_dtype, maxiters=iters)
    res = dec(noise)
    np.asarray(res.iterations)  # settle; small fetch (bits would drag
    assert np.asarray(res.success).mean() < 0.05  # 168 MB through the tunnel)
    t0 = time.perf_counter()
    rep = 8
    for _ in range(rep):
        res = dec(noise)
    np.asarray(res.iterations)  # one small blocking fetch after rep dispatches
    dt = (time.perf_counter() - t0) / rep
    rate = batch * iters / dt
    print(f"{code.name} pallas_layered steady state: {rate/1e6:.2f}M cw*iter/s")
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", default="TM8192")
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--skip-measure", action="store_true",
                    help="only print the static op counts")
    args = ap.parse_args()
    code = get_code(args.code)
    c = count_layered_ops(code)
    print(
        f"{code.name}: layered kernel per iter per cw: "
        f"{c['element_ops']/1e3:.1f}k element-ops + "
        f"{c['element_moves']/1e3:.1f}k element-moves "
        f"(M={c['M']}, R={c['R']}, Cc={c['Cc']}, sumA={c['sumA']})"
    )
    if args.skip_measure:
        return
    # ILP sweep: each calibration chain is latency-bound, so take the max
    # over chain counts. With the auto-K timing fix the best chains reach
    # ~80-85% of the 1.50 GHz 6.1 T element-op model peak — a STRONG
    # measured lower bound on what the VPU sustains for this op mix.
    vpu = max(measure_vpu_peak(chains=ch) for ch in (4, 8, 16))
    # the node-major parts shape sustains comparable rates: the tall
    # (q, B) planes are NOT intrinsically issue-limited
    vpu_parts = max(measure_vpu_peak(M=256, B=32, chains=ch) for ch in (4, 8))
    roll = max(measure_roll_peak(chains=ch) for ch in (4, 8, 16))
    subroll = max(measure_subroll_peak(chains=ch) for ch in (4, 8))
    rate = measure_ms_iter(code, batch=args.batch)
    eff = c["element_ops"] * rate
    # v5e VPU: 8x128 lanes x 4 ALUs; public clock estimates span
    # 0.94-1.56 GHz => 3.9-6.4 T f32 element-ops/s lane-issue peak
    lo, hi = 1024 * 4 * 0.94e9, 1024 * 4 * 1.56e9
    print(
        f"effective element-op rate: {eff/1e12:.2f} Tops/s "
        f"(zero-fusion counted ops x measured decode rate) = "
        f"{100*eff/hi:.0f}-{100*eff/lo:.0f}% of the "
        f"{lo/1e12:.1f}-{hi/1e12:.1f} T theoretical peak; best calibration "
        f"chains: mix {vpu/1e12:.2f} T (parts shape {vpu_parts/1e12:.2f} T), "
        f"lane roll {roll/1e12:.2f} T, sublane roll {subroll/1e12:.2f} T "
        f"element-moves/s. Interpretation (see STATUS.md roofline): the "
        f"compiled census is the primary instrument; these calibrations "
        f"price the op classes (a sublane roll costs "
        f"{vpu_parts/max(subroll,1.0):.1f}x an ALU slot on the parts shape)."
    )


if __name__ == "__main__":
    main()
