"""VMEM-resident QC min-sum decoder as a single Pallas TPU kernel.

The round-1 XLA roll-based decoder (ops/qc_minsum.py) is HBM-bound: every
while_loop iteration streams the whole message state (|E| x batch) plus
roll materializations through HBM. This kernel changes the bound: the grid
tiles the BATCH, and one grid step keeps the entire decode state for its
codeword tile — messages, check stats, posteriors, frozen outputs — in
VMEM for the full iteration loop. HBM traffic per codeword is one LLR read
and one hard-bit write, independent of iteration count; the steady-state
loop is VPU/VMEM-bound, which is the "speed-of-light" regime for this
memory-bound algorithm (north-star: large-code kernel with on-chip LLR
residency).

Same algorithm as the reference `decode_ms` (decoder.rs:347-475,
self-corrected min-sum, Savin arXiv:0803.1090) in the QC roll formulation
(docs/DESIGN.md section 2): every H sub-block is a permutation = whole-block
lane roll (theta quarter-rotation) + four per-quarter lane rolls (phi), so
message movement is pure lane rotation — no gathers. Two addend-loop
variants: the default unrolls the edge loops with STATIC roll shifts
(identity sub-blocks free, static lane permutes for the rest — fastest);
`static_tables=False` instead runs `fori_loop` over scalar-prefetched
permutation tables (SMEM), keeping the Mosaic IR and scoped-VMEM stack
O(1) in the addend count — the two failure modes of the round-1
whole-decode kernel (docs/DESIGN.md section 6) — at ~60% of the static
variant's throughput.

Layout: batch on SUBLANES, nodes on LANES — (B_tile, M) planes — so
permutations are lane rolls and each grid step's tile early-exits its own
`while_loop` independently (easy tiles finish in 2-3 iterations without
waiting for the whole batch).

Supported: codes with lane-tile-multiple submatrix size (M % 128 == 0 —
all six TM codes). For M >= 512 the theta/phi quarter slices stay
lane-tile aligned (slice+roll+concat); M = 256 lowers the 64-lane slices
acceptably; M = 128 instead assembles each permutation from full-width
masked rolls (see _static_perm_fns). TC codes (M <= 64) stay on the XLA
qc/layered paths. Per-code batch-tile defaults are measured-in
(ops/routing.py). Float32 is bit-exact vs
make_ms_decoder_qc(f32) (same accumulation order); bfloat16 stores
messages/posteriors in bf16 with f32 compute (per-step rounding), matching
the XLA bf16 path's contract (validated on decode outcomes + BER).

int8/int16 LLRs run saturating int semantics with f32 storage and compute
— exact, because every value the int algorithms can produce is an integer
of magnitude <= 32767 * (1 + var degree) << 2^24, so f32
add/sub/abs/compare on them is lossless and `clip` reproduces the
saturation points. The FLOODING kernel clamps at every add/sub exactly
like the reference (decoder.rs:42-55; its posterior is recomputed from
scratch each iteration, so that clipping is transient) and is bit-exact
(bits/success/iterations) vs make_ms_decoder_qc_int. The LAYERED kernel
saturates MESSAGES only and keeps its carried posterior accumulator WIDE
— in-place clipping would compound across layers/iterations and wreck the
waterfall (measured: qc_minsum.py make_ms_decoder_layered docstring) —
and is bit-exact vs that XLA twin. Mosaic v5e cannot vector-compare int8
natively; the f32-clip formulation sidesteps that while keeping the
VMEM-resident speed of the float kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..codes.expand import qc_structure
from ..codes.params import LDPCCode, get_code
from ..sizes import ms_flooding_scratch_specs, ms_layered_scratch_specs
from .minsum import MSResult

__all__ = ["make_ms_decoder_pallas_qc", "make_ms_decoder_pallas_layered"]


def _static_perm_fns(M: int):
    """Static-shift block permutation helpers for (B, M) planes (nodes on
    lanes). Shifts are compile-time constants, so identity sub-blocks cost
    nothing and the rest lower to static lane permutes.
    (pltpu.roll wants non-negative static shifts: -s == width - s.)

    For M >= 512 the quarter slices are lane-tile (128) aligned and the
    slice+roll+concat form is cheapest. For M < 512 (q = M//4 < 128) those
    sub-tile slices force Mosaic relayouts; instead each output quarter is
    assembled from full-M rolls masked by STATIC lane predicates:
    out[tq + j] = x[src*q + (j + ph) % q] is roll(x, a)[l] with
    a = (t - src)*q - ph for the non-wrapping j and a + q for the wrap,
    selected by the static mask j < q - ph. All ops are full-width — no
    slices, no concats."""
    q = M // 4

    def fwd_perm_s(x, perm):
        """Check-side view of a (B, M) var block."""
        if perm.kind == "rot":
            sh = (-perm.shift) % M
            return x if sh == 0 else pltpu.roll(x, sh, axis=1)
        parts = []
        for t in range(4):  # output (check-side) quarter
            src = (perm.theta + t) % 4
            xq = x[:, src * q : (src + 1) * q]
            sh = (-perm.phis[t]) % q
            parts.append(xq if sh == 0 else pltpu.roll(xq, sh, axis=1))
        return jnp.concatenate(parts, axis=1)

    def inv_perm_s(x, perm):
        """Scatter check-side values back to the var side (inverse)."""
        if perm.kind == "rot":
            sh = perm.shift % M
            return x if sh == 0 else pltpu.roll(x, sh, axis=1)
        parts = []
        for t in range(4):  # output (var-side) quarter
            j = (t - perm.theta) % 4
            xq = x[:, j * q : (j + 1) * q]
            sh = perm.phis[j] % q
            parts.append(xq if sh == 0 else pltpu.roll(xq, sh, axis=1))
        return jnp.concatenate(parts, axis=1)

    def _masked(x, srcs, phs):
        """out quarter t, lane i: x[srcs[t]*q + (i - phs[t]) % q] — i.e. a
        within-quarter roll by phs[t] of input quarter srcs[t] — built from
        full-M static rolls + static lane masks (no sub-tile slices).
        Non-wrapping lanes (i >= ph) come from roll(x, (t-src)*q + ph);
        wrapping lanes (i < ph) need the extra -q: roll(x, a - q)."""
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
        j = lane % q  # static per-lane quarter offset
        out = None
        for t in range(4):
            src, ph = srcs[t], phs[t] % q
            a = ((t - src) * q + ph) % M
            r0 = x if a == 0 else pltpu.roll(x, a, axis=1)
            if ph == 0:
                contrib = r0
            else:
                a2 = (a - q) % M
                r1 = x if a2 == 0 else pltpu.roll(x, a2, axis=1)
                contrib = jnp.where(j >= ph, r0, r1)
            sel = lane // q == t
            out = jnp.where(sel, contrib, out) if out is not None else contrib
        return out

    def fwd_perm_m(x, perm):
        if perm.kind == "rot":
            sh = (-perm.shift) % M
            return x if sh == 0 else pltpu.roll(x, sh, axis=1)
        # output quarter t reads source quarter (theta+t)%4 rolled by
        # -phis[t] within the quarter
        srcs = [(perm.theta + t) % 4 for t in range(4)]
        phs = [(-perm.phis[t]) % q for t in range(4)]
        return _masked(x, srcs, phs)

    def inv_perm_m(x, perm):
        if perm.kind == "rot":
            sh = perm.shift % M
            return x if sh == 0 else pltpu.roll(x, sh, axis=1)
        srcs = [(t - perm.theta) % 4 for t in range(4)]
        phs = [perm.phis[(t - perm.theta) % 4] % q for t in range(4)]
        return _masked(x, srcs, phs)

    # Measured on v5e (TM1280/TM1536, layered, B=32768, the steady-state
    # tile-sweep probe of tools/bench_pallas_qc.py — absolute numbers are
    # probe-protocol-specific, only the variant ratios matter): masked
    # full-width rolls beat slice+concat only at M=128 (2.31M vs 1.75M
    # cw/s); at M=256 the 64-lane slices already lower well and masking
    # loses (1.79M vs 3.07M). Gate accordingly.
    if M == 128:
        return fwd_perm_m, inv_perm_m
    return fwd_perm_s, inv_perm_s


def _lane_part_fns(s, use_parts: bool):
    """Parts formulation on the LANE axis — the lane-major mirror of
    pallas_tc._part_fns.

    For M >= 512 every pi quarter is lane-tile aligned (q = M/4 >= 128)
    and every TM rot block is the identity (shift 0, codes/constants.py),
    so a logical (B, M) plane splits into FOUR independent (B, q) lane
    parts closed under every block permutation: identity keeps parts in
    place, a pi perm reindexes parts and lane-rolls each. The kernels
    then never materialize an (B, M) value: no concats, no slices of
    computed values. Despite removing the shape_cast/slice/concat ops
    the round-4 Mosaic census counted at ~26% of issue slots, this is a
    measured WIN only on TM2048 (gating rationale in the body comment) —
    other codes return ONE part with the _static_perm_fns full-plane
    perms (the kernels are generic over P).

    Returns (P, q, fwd, inv); fwd/inv map part lists to NEW part lists.
    fwd: var-side parts -> check-side view (g[i] = x[perm(i)]);
    inv: check-side parts -> var-side scatter (y[perm(i)] = g[i]).
    """
    M = s.m
    # use_parts comes from the caller, which reads it off the explicit
    # per-code routing table (ops/routing.py `ms_lane_parts` — measured
    # winner: TM2048 only, +16-21%; TM8192 flat, TM5120 -7%, TM6144 -38%;
    # provenance in the routing module docstring). No structural
    # fingerprinting here: a new code must be measured and routed
    # explicitly (ADVICE r4 / VERDICT r4 item 5).
    if not use_parts:
        fwd_s, inv_s = _static_perm_fns(M)

        def fwd1(parts, perm):
            return [fwd_s(parts[0], perm)]

        def inv1(parts, perm):
            return [inv_s(parts[0], perm)]

        return 1, M, fwd1, inv1
    assert all(
        perm.kind != "rot" or perm.shift == 0 for row in s.rows for perm in row
    ), "mixed nonzero-rotation + pi prototypes are not quarterable"
    assert M % 512 == 0, "lane parts need lane-tile-aligned quarters (M/4 >= 128)"
    q = M // 4

    def _roll(x, sh):
        return x if sh == 0 else pltpu.roll(x, sh, axis=1)

    def fwd(parts, perm):
        if perm.kind == "rot":
            return list(parts)  # identity
        # check part t reads var part (theta+t)%4 rolled by -phis[t]
        return [
            _roll(parts[(perm.theta + t) % 4], (-perm.phis[t]) % q)
            for t in range(4)
        ]

    def inv(parts, perm):
        if perm.kind == "rot":
            return list(parts)
        # var part v receives check part t=(v-theta)%4 rolled by +phis[t]
        out = []
        for v in range(4):
            t = (v - perm.theta) % 4
            out.append(_roll(parts[t], perm.phis[t] % q))
        return out

    return 4, q, fwd, inv


def _edge_tables(s):
    """Uniform per-addend permutation tables (rot == pi with theta=0,
    phis = (shift,)*4): row, col*M, theta*(M/4), phis[4]."""
    rows, colq, thetaq, phis = [], [], [], []
    for r, row in enumerate(s.rows):
        for perm in row:
            rows.append(r)
            colq.append(perm.col * s.m)
            if perm.kind == "rot":
                thetaq.append(0)
                phis.append([perm.shift] * 4)
            else:
                thetaq.append(perm.theta * (s.m // 4))
                phis.append(list(perm.phis))
    row_off = [0]
    for row in s.rows:
        row_off.append(row_off[-1] + len(row))
    return (
        np.asarray(rows, np.int32),
        np.asarray(colq, np.int32),
        np.asarray(thetaq, np.int32),
        np.asarray(phis, np.int32),
        np.asarray(row_off, np.int32),
    )


def make_ms_decoder_pallas_qc(
    code: LDPCCode | str,
    dtype=jnp.float32,
    maxiters: int = 20,
    alpha: float | None = None,
    batch_tile: int | None = None,
    interpret: bool = False,
    static_tables: bool = True,
):
    """Build the fused VMEM-resident QC min-sum decoder.

    Returns fn(llrs: (B, n) dtype) -> MSResult; B must be a multiple of
    `batch_tile`. See module docstring for the design; the update rules are
    identical to make_ms_decoder_qc (f32 is bit-exact against it).

    int8/int16 dtypes run the reference's saturating semantics with f32
    storage/compute (exact — module docstring) and are bit-exact vs
    make_ms_decoder_qc_int (bits/success/iterations); static_tables only.

    `static_tables=True` (default) burns the permutation tables into the
    Mosaic IR (Python-unrolled edge loops, static roll shifts) instead of
    streaming them from SMEM through `fori_loop`: identity sub-blocks then
    cost nothing and the remaining rolls compile to static lane permutes —
    1.2-1.7x faster than the dynamic variant on a v5e core (TM8192 f32:
    380k vs 219k cw/s at B=16384 under the round-2 UNPIPELINED protocol —
    both sides pay the ~30ms tunnel dispatch, so only the ratio carries;
    current pipelined numbers live in results.jsonl). The price is a
    larger kernel body
    (compile ~6 s vs ~2 s; the scoped-VMEM stack holds the unrolled
    temporaries, still comfortable at batch_tile=64). `static_tables=False`
    keeps the O(1)-IR fallback.
    """
    code = get_code(code)
    from .routing import route_for

    route = route_for(code)
    if route.ms_layout == "node_major":
        # TC codes + TM1280/TM1536 use the transposed node-major kernels,
        # which share this factory's contract (bit-exact vs
        # make_ms_decoder_qc for f32, saturating int semantics): TC codes
        # are pure sublane rolls and the small-M TM pi perms decompose
        # into quarter parts there (measured 1.8x the lane-major kernels;
        # for M >= 512 the lane-major layout wins instead — per-code
        # provenance in ops/routing.py) — see ops/pallas_tc.py
        from .pallas_tc import make_ms_decoder_pallas_tc_qc

        return make_ms_decoder_pallas_tc_qc(
            code, dtype, maxiters, alpha, batch_tile, interpret
        )
    p = code.params
    in_dtype = dtype = jnp.dtype(dtype)
    is_int = dtype in (jnp.dtype(jnp.int8), jnp.dtype(jnp.int16))
    if is_int:
        # saturating int semantics, f32 storage/compute (module docstring)
        if not static_tables:
            raise ValueError("int LLRs require the static_tables kernel")
        if alpha is not None:
            raise ValueError("the saturating int path does not support alpha")
        sat_lo = float(jnp.iinfo(dtype).min)
        sat_hi = float(jnp.iinfo(dtype).max)
        dtype = jnp.dtype(jnp.float32)
    elif dtype not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        raise ValueError("pallas qc decoder supports float32/bfloat16/int8/int16")
    s = qc_structure(code)
    M, R, Cc = s.m, s.n_block_rows, s.n_block_cols
    if M < 128 or M % 128:
        raise ValueError(
            f"pallas qc decoder needs a lane-tile-multiple submatrix size "
            f"(M >= 128, M % 128 == 0); {code.name} has M={M} — use "
            f"make_ms_decoder_qc"
        )
    n, V = p.n, Cc * M
    q = M // 4
    sumA = sum(len(r) for r in s.rows)
    B = route.ms_batch_tile if batch_tile is None else batch_tile
    rows_t, colq_t, thetaq_t, phis_t, row_off_t = _edge_tables(s)
    # BIG: large sentinel for the running two-min (f32 compute); the int
    # path instead seeds min1/min2 at the saturation point, matching
    # make_ms_decoder_qc_int's jnp.full(HI) (itself decoder.rs:42-55)
    BIG = 3.4e38
    f32 = jnp.float32
    alpha_c = None if alpha is None else float(alpha)

    def fwd_perm(x, thq, ph):
        """Check-side view of a var block: perm_rows(x_T, perm).T.
        x: (B, M) f32; thq = theta*q; ph: tuple of 4 SMEM-loaded scalars."""
        y = pltpu.roll(x, -thq, axis=1)
        parts = [
            pltpu.roll(y[:, t * q : (t + 1) * q], -ph[t], axis=1) for t in range(4)
        ]
        return jnp.concatenate(parts, axis=1)

    def inv_perm(x, thq, ph):
        """Scatter check-side values back to the var side (inverse)."""
        parts = [
            pltpu.roll(x[:, j * q : (j + 1) * q], ph[j], axis=1) for j in range(4)
        ]
        return pltpu.roll(jnp.concatenate(parts, axis=1), thq, axis=1)

    i32 = jnp.int32

    def u_from(v, m1, m2, sg):
        """Check->var message from stats (decoder.rs:388-405); v/m1/m2 f32,
        sg the BOOLEAN sign product (an exact 0/1 — kept as i1/i32 to skip
        bool->f32 casts and float mod-2 chains, STATUS.md roofline)."""
        av = jnp.abs(v)
        mag = jnp.where(av == m1, m2, m1)
        if alpha_c is not None:
            mag = alpha_c * mag
        neg = jnp.logical_xor(sg, v < 0.0)
        return jnp.where(neg, -mag, mag)

    def kernel(
        rows_r,  # scalar prefetch (SMEM): (sumA,)
        colq_r,  # (sumA,)
        thetaq_r,  # (sumA,)
        phis_r,  # (sumA, 4)
        row_off_r,  # (R+1,)
        llr_ref,  # (B, n) dtype VMEM block
        bits_ref,  # out: (B, V) f32 hard bits 0/1
        done_ref,  # out: (B, 1) f32
        iters_ref,  # out: (B, 1) i32
        vs_ref,  # scratch: (sumA, B, M) dtype  var->check messages
        m1_ref,  # scratch: (R, B, M) dtype
        m2_ref,  # scratch: (R, B, M) dtype
        sg_ref,  # scratch: (R, B, M) i32 (0/1 sign products)
        va_ref,  # scratch: (B, V) dtype  posteriors
        frozen_ref,  # scratch: (B, V) i32 frozen hard bits 0/1
        fdone_ref,  # scratch: (B, 1) f32
        fiters_ref,  # scratch: (B, 1) i32
    ):
        # per-tile state init (scratch persists across grid steps)
        vs_ref[...] = jnp.zeros((sumA, B, M), dtype)
        m1_ref[...] = jnp.zeros((R, B, M), dtype)  # min1 = 0 (decoder.rs:374)
        m2_ref[...] = jnp.zeros((R, B, M), dtype)
        sg_ref[...] = jnp.zeros((R, B, M), i32)
        fdone_ref[...] = jnp.zeros((B, 1), f32)
        fiters_ref[...] = jnp.full((B, 1), maxiters, jnp.int32)
        frozen_ref[...] = jnp.zeros((B, V), i32)

        def sweep1_body(e, _):
            r = rows_r[e]
            v = vs_ref[e].astype(f32)
            u = u_from(
                v, m1_ref[r].astype(f32), m2_ref[r].astype(f32), sg_ref[r] != 0
            )
            ph = tuple(phis_r[e, j] for j in range(4))
            w = inv_perm(u, thetaq_r[e], ph)
            c0 = pl.multiple_of(colq_r[e], 128)
            va_ref[:, pl.ds(c0, M)] += w.astype(dtype)
            return 0

        def row_body(r, ok):
            m1o = m1_ref[r].astype(f32)
            m2o = m2_ref[r].astype(f32)
            sgo = sg_ref[r] != 0

            def edge_body(e, carry):
                m1n, m2n, sgc, par = carry
                v = vs_ref[e].astype(f32)
                u = u_from(v, m1o, m2o, sgo)
                c0 = pl.multiple_of(colq_r[e], 128)
                ph = tuple(phis_r[e, j] for j in range(4))
                g = fwd_perm(va_ref[:, pl.ds(c0, M)].astype(f32), thetaq_r[e], ph)
                nv = g - u
                # self-correction: zero oscillating messages (decoder.rs:420-426)
                keep = jnp.logical_or((nv < 0.0) == (v < 0.0), v == 0.0)
                nv = jnp.where(keep, nv, 0.0)
                vs_ref[e] = nv.astype(dtype)
                par = jnp.logical_xor(par, g < 0.0)
                a1 = jnp.abs(nv.astype(dtype).astype(f32))
                is_new = a1 < m1n
                m2n = jnp.where(is_new, m1n, jnp.minimum(m2n, a1))
                m1n = jnp.minimum(m1n, a1)
                sgc = jnp.logical_xor(sgc, nv < 0.0)
                return (m1n, m2n, sgc, par)

            big = jnp.full((B, M), BIG, f32)
            fb = jnp.zeros((B, M), jnp.bool_)
            m1n, m2n, sgc, par = jax.lax.fori_loop(
                row_off_r[r],
                row_off_r[r + 1],
                edge_body,
                (big, jnp.zeros((B, M), f32), fb, fb),
            )
            m1_ref[r] = m1n.astype(dtype)
            m2_ref[r] = m2n.astype(dtype)
            sg_ref[r] = sgc.astype(i32)
            parf = par.astype(f32)  # exact 0/1
            row_ok = jnp.min(1.0 - parf, axis=1, keepdims=True)  # 1 iff all even
            return ok * row_ok

        def iter_body(carry):
            it, _cont = carry
            # ---- sweep 1: posteriors from llr + all check messages ----
            va_ref[:, :n] = llr_ref[...]
            if V > n:  # punctured tail = 0 (decoder.rs:382-383)
                va_ref[:, n:] = jnp.zeros((B, V - n), dtype)
            jax.lax.fori_loop(0, sumA, sweep1_body, 0)
            # ---- sweep 2: per-row streamed stats + self-corrected v ----
            ok = jax.lax.fori_loop(0, R, row_body, jnp.ones((B, 1), f32))
            # ---- freeze converged codewords at this iteration ----
            done = fdone_ref[...]
            newly = ok * (1.0 - done)
            signs = (va_ref[...].astype(f32) < 0.0).astype(i32)
            frozen_ref[...] = jnp.where(newly > 0.0, signs, frozen_ref[...])
            fiters_ref[...] = jnp.where(
                newly > 0.0, jnp.full((B, 1), 1, jnp.int32) * it, fiters_ref[...]
            )
            done = jnp.maximum(done, ok)
            fdone_ref[...] = done
            cont = jnp.logical_and(it + 1 < maxiters, jnp.min(done) < 1.0)
            return (it + 1, cont)

        jax.lax.while_loop(
            lambda c: c[1], iter_body, (jnp.int32(0), jnp.bool_(True))
        )
        # non-converged codewords emit their final posterior signs
        done = fdone_ref[...]
        signs = (va_ref[...].astype(f32) < 0.0).astype(i32)
        # values are exactly 0/1 i32: compare-then-cast (bool -> u8)
        bits_ref[...] = (
            jnp.where(done > 0.0, frozen_ref[...], signs) > 0
        ).astype(jnp.uint8)
        done_ref[...] = done
        iters_ref[...] = fiters_ref[...]

    # ---- statically-unrolled variant ------------------------------------
    # Same update rules, but the edge loops are Python-unrolled with the
    # permutation shifts as compile-time constants, and every (B, M)
    # logical plane carried as P lane parts (_lane_part_fns): identity
    # sub-blocks cost zero rolls, pi perms are part reindexes + per-part
    # static lane rolls, and no (B, M) value is ever materialized.
    P, pq, fwd_parts, inv_parts = _lane_part_fns(s, route.ms_lane_parts)

    def kernel_static(
        llr_ref,
        bits_ref,
        done_ref,
        iters_ref,
        vs_ref,
        m1_ref,
        m2_ref,
        sg_ref,
        va_ref,
        frozen_ref,
        fdone_ref,
        fiters_ref,
    ):
        def vparts(base):
            return [
                va_ref[:, base + j * pq : base + (j + 1) * pq].astype(f32)
                for j in range(P)
            ]

        def eparts(ref, e):
            return [
                ref[e, :, j * pq : (j + 1) * pq].astype(f32) for j in range(P)
            ]

        def weparts(ref, e, parts):
            for j, x in enumerate(parts):
                ref[e, :, j * pq : (j + 1) * pq] = x.astype(dtype)

        # NO zero-init of vs/m1/m2/sg: iteration 0 is PEELED below with the
        # reference's zero-state shortcut (u == 0 everywhere, decoder.rs:374
        # zeroes the working area), which writes every one of those scratch
        # planes before anything reads them.
        fdone_ref[...] = jnp.zeros((B, 1), f32)
        fiters_ref[...] = jnp.full((B, 1), maxiters, jnp.int32)
        frozen_ref[...] = jnp.zeros((B, V), i32)

        def one_iteration(it, first):
            """One flooding iteration; `first` (Python bool) specializes the
            peeled iteration 0 where all messages/stats are zero: sweep 1
            degenerates to va = llr and sweep 2's u is exactly 0 (so nv = g,
            self-correction always keeps — v == 0). Bit-exact vs the general
            body run on zero state."""
            # ---- sweep 1: posteriors from llr + all check messages ----
            va_ref[:, :n] = llr_ref[...]
            if V > n:  # punctured tail = 0 (decoder.rs:382-383)
                va_ref[:, n:] = jnp.zeros((B, V - n), dtype)
            if not first:
                e = 0
                for r, row in enumerate(s.rows):
                    m1o = eparts(m1_ref, r)
                    m2o = eparts(m2_ref, r)
                    sgo = [
                        sg_ref[r, :, j * pq : (j + 1) * pq] != 0 for j in range(P)
                    ]
                    for perm in row:
                        u = [
                            u_from(v, m1o[j], m2o[j], sgo[j])
                            for j, v in enumerate(eparts(vs_ref, e))
                        ]
                        c0 = perm.col * M
                        uv = inv_parts(u, perm)
                        for j in range(P):
                            sl = slice(c0 + j * pq, c0 + (j + 1) * pq)
                            if is_int:  # saturate every add (decoder.rs:46-48)
                                va_ref[:, sl] = jnp.clip(
                                    va_ref[:, sl] + uv[j], sat_lo, sat_hi
                                )
                            else:
                                va_ref[:, sl] += uv[j].astype(dtype)
                        e += 1
            # ---- sweep 2: per-row streamed stats + self-corrected v ----
            # sign products and parities are exact booleans: i1 XOR chains
            # instead of float adds + mod-2 (identical values — STATUS.md
            # roofline; the sg plane stores the bit as i32); parts never
            # interact: P independent chains per row
            ok = jnp.ones((B, 1), f32)
            e = 0
            for r, row in enumerate(s.rows):
                if not first:
                    m1o = eparts(m1_ref, r)
                    m2o = eparts(m2_ref, r)
                    sgo = [
                        sg_ref[r, :, j * pq : (j + 1) * pq] != 0 for j in range(P)
                    ]
                big0 = sat_hi if is_int else BIG
                m1n = [jnp.full((B, pq), big0, f32) for _ in range(P)]
                m2n = [
                    jnp.full((B, pq), sat_hi, f32) if is_int
                    else jnp.zeros((B, pq), f32)
                    for _ in range(P)
                ]
                sgc = [jnp.zeros((B, pq), jnp.bool_) for _ in range(P)]
                par = [jnp.zeros((B, pq), jnp.bool_) for _ in range(P)]
                for perm in row:
                    g = fwd_parts(vparts(perm.col * M), perm)
                    if first:
                        nv = g
                    else:
                        vo = eparts(vs_ref, e)
                        nv = []
                        for j in range(P):
                            u = u_from(vo[j], m1o[j], m2o[j], sgo[j])
                            x = g[j] - u
                            if is_int:  # saturating sub (decoder.rs:46-48)
                                x = jnp.clip(x, sat_lo, sat_hi)
                            # self-correction (decoder.rs:420-426)
                            keep = jnp.logical_or(
                                (x < 0.0) == (vo[j] < 0.0), vo[j] == 0.0
                            )
                            nv.append(jnp.where(keep, x, 0.0))
                    weparts(vs_ref, e, nv)
                    for j in range(P):
                        par[j] = jnp.logical_xor(par[j], g[j] < 0.0)
                        if is_int:  # saturating abs: |-128| -> 127
                            a1 = jnp.minimum(jnp.abs(nv[j]), sat_hi)
                        else:
                            a1 = jnp.abs(nv[j].astype(dtype).astype(f32))
                        is_new = a1 < m1n[j]
                        m2n[j] = jnp.where(is_new, m1n[j], jnp.minimum(m2n[j], a1))
                        m1n[j] = jnp.minimum(m1n[j], a1)
                        sgc[j] = jnp.logical_xor(sgc[j], nv[j] < 0.0)
                    e += 1
                weparts(m1_ref, r, m1n)
                weparts(m2_ref, r, m2n)
                for j in range(P):
                    sg_ref[r, :, j * pq : (j + 1) * pq] = sgc[j].astype(i32)
                    parf = par[j].astype(f32)  # exact 0/1
                    ok = ok * jnp.min(1.0 - parf, axis=1, keepdims=True)
            # ---- freeze converged codewords at this iteration ----
            done = fdone_ref[...]
            newly = ok * (1.0 - done)
            signs = (va_ref[...].astype(f32) < 0.0).astype(i32)
            frozen_ref[...] = jnp.where(newly > 0.0, signs, frozen_ref[...])
            fiters_ref[...] = jnp.where(
                newly > 0.0, jnp.full((B, 1), 1, jnp.int32) * it, fiters_ref[...]
            )
            done = jnp.maximum(done, ok)
            fdone_ref[...] = done
            return done

        done0 = one_iteration(jnp.int32(0), True)

        def iter_body(carry):
            it, _cont = carry
            done = one_iteration(it, False)
            cont = jnp.logical_and(it + 1 < maxiters, jnp.min(done) < 1.0)
            return (it + 1, cont)

        cont0 = jnp.logical_and(1 < maxiters, jnp.min(done0) < 1.0)
        jax.lax.while_loop(lambda c: c[1], iter_body, (jnp.int32(1), cont0))
        done = fdone_ref[...]
        signs = (va_ref[...].astype(f32) < 0.0).astype(i32)
        # values are exactly 0/1 i32: compare-then-cast (bool -> u8)
        bits_ref[...] = (
            jnp.where(done > 0.0, frozen_ref[...], signs) > 0
        ).astype(jnp.uint8)
        done_ref[...] = done
        iters_ref[...] = fiters_ref[...]

    @functools.lru_cache(maxsize=8)
    def build(batch: int):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0 if static_tables else 5,
            grid=(batch // B,),
            in_specs=[
                pl.BlockSpec((B, n), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=[
                pl.BlockSpec((B, V), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            ],
            # shapes sourced from sizes.py — the memory-table single source
            # of truth (sizes.ms_flooding_scratch_specs docstring)
            scratch_shapes=[
                pltpu.VMEM(sh, dt)
                for sh, dt in ms_flooding_scratch_specs(
                    sumA, R, V, M, B, dtype, node_major=False
                )
            ],
        )
        return pl.pallas_call(
            kernel_static if static_tables else kernel,
            out_shape=[
                jax.ShapeDtypeStruct((batch, V), jnp.uint8),
                jax.ShapeDtypeStruct((batch, 1), f32),
                jax.ShapeDtypeStruct((batch, 1), jnp.int32),
            ],
            grid_spec=gs,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )

    tables = (
        jnp.asarray(rows_t),
        jnp.asarray(colq_t),
        jnp.asarray(thetaq_t),
        jnp.asarray(phis_t),
        jnp.asarray(row_off_t),
    )

    @jax.jit
    def decode(llrs: jnp.ndarray) -> MSResult:
        llrs = jnp.asarray(llrs, dtype)
        assert llrs.ndim == 2 and llrs.shape[1] == n, f"llrs must be (B, {n})"
        batch = llrs.shape[0]
        # pad the batch to a tile multiple; padded rows decode garbage that
        # is sliced away (they cannot slow the real rows: each grid step
        # early-exits its own tile independently)
        pad = (-batch) % B
        if pad:
            llrs = jnp.concatenate([llrs, jnp.ones((pad, n), dtype)], axis=0)
        if static_tables:
            bits_u8, done_f, iters = build(batch + pad)(llrs)
        else:
            bits_u8, done_f, iters = build(batch + pad)(*tables, llrs)
        return MSResult(
            success=done_f[:batch, 0] > 0.0,
            iterations=iters[:batch, 0],
            bits=bits_u8[:batch],
        )

    return decode


def make_ms_decoder_pallas_layered(
    code: LDPCCode | str,
    dtype=jnp.float32,
    maxiters: int = 20,
    alpha: float | None = None,
    batch_tile: int | None = None,
    interpret: bool = False,
    subtiles: int = 1,
    recompute_u: bool | None = None,
):
    """VMEM-resident ROW-LAYERED self-corrected min-sum Pallas kernel.

    Same layered schedule as `make_ms_decoder_layered` (qc_minsum.py):
    block-rows of H are processed sequentially within one iteration, each
    layer consuming posteriors already updated by the previous layers, so
    information propagates R times faster than under the reference's
    flooding schedule (decoder.rs:347-475) and the decoder needs fewer
    iterations for the same result — a deliberate, documented algorithmic
    divergence validated statistically (BER anchors) rather than against
    the reference bit-for-bit. f32 is bit-exact vs the XLA layered
    implementation (same accumulation order), including iteration counts.
    int8/int16 run the saturating semantics with f32 storage/compute
    (module docstring) and are bit-exact (bits/success/iterations) vs the
    XLA layered int path (make_ms_decoder_layered with an int dtype), which
    mirrors this kernel's exact clip placement (tests/test_pallas.py).

    Fusion strategy mirrors make_ms_decoder_pallas_qc's static variant:
    grid over the batch, whole decode state (check messages u, previous
    extrinsics t', posteriors) in VMEM scratch for the tile's entire
    early-exiting while_loop; permutation shifts burned into the IR as
    static lane rolls. Iteration 0 is peeled (u = t' = 0 shortcuts).

    `subtiles=S` (experiment knob, VERDICT r4 item 1 protocol) processes
    S sequential batch_tile-wide sub-tiles inside ONE grid step: the grid
    shrinks S-fold while per-sub-tile decode VMEM (scratch) stays
    constant — scratch is REUSED across the S sub-tiles — so the config
    isolates per-grid-step pipeline overhead from VMEM pressure (unlike a
    2x batch_tile, whose scratch doubles and which measured 15% SLOWER).
    Each sub-tile still runs its own early-exiting while_loop. Bit-exact
    for any S (tests/test_pallas.py); production routes keep S=1 unless
    the routing table says otherwise.

    `recompute_u` (default: the routing table's per-code measured value)
    drops the per-edge check-message planes `u` from VMEM: the previous
    iteration's u is a pure function of the stored self-corrected
    extrinsic t' and that layer's two-min stats (m1, m2, sign product),
    so the kernel stores 3 stat planes per LAYER instead of one u plane
    per EDGE — scratch shrinks by (sumA - 3R) (B, M) planes (TM5120:
    39 -> 9) and the per-iteration u reads become shared stat-plane
    reads plus ~5 ALU ops per addend. Bit-exact vs the stored-u form by
    construction (the recomputation replays the exact producer
    expression); pinned in tests/test_pallas.py.

    Returns fn(llrs: (B, n) dtype) -> MSResult.
    """
    code = get_code(code)
    from .routing import route_for

    route = route_for(code)
    if route.ms_layout == "node_major":
        # TC codes + TM1280/TM1536 use the transposed node-major kernels
        # (bit-exact vs make_ms_decoder_layered for f32): TC sublane
        # rolls plus the quartered pi-part path (measured 1.8x the
        # masked-roll lane-major kernels there; per-code provenance in
        # ops/routing.py) — see ops/pallas_tc.py
        from .pallas_tc import make_ms_decoder_pallas_tc_layered

        return make_ms_decoder_pallas_tc_layered(
            code, dtype, maxiters, alpha, batch_tile, interpret
        )
    p = code.params
    dtype = jnp.dtype(dtype)
    is_int = dtype in (jnp.dtype(jnp.int8), jnp.dtype(jnp.int16))
    if is_int:
        # saturating int semantics with f32 storage/compute (module
        # docstring); bit-exact vs the XLA layered int twin
        if alpha is not None:
            raise ValueError("the saturating int path does not support alpha")
        sat_lo = float(jnp.iinfo(dtype).min)
        sat_hi = float(jnp.iinfo(dtype).max)
        dtype = jnp.dtype(jnp.float32)
    elif dtype not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        raise ValueError(
            "pallas layered decoder supports float32/bfloat16/int8/int16"
        )
    s = qc_structure(code)
    M, R, Cc = s.m, s.n_block_rows, s.n_block_cols
    if M < 128 or M % 128:
        raise ValueError(
            f"pallas layered decoder needs a lane-tile-multiple submatrix "
            f"size (M >= 128, M % 128 == 0); {code.name} has M={M} — use "
            f"make_ms_decoder_layered"
        )
    n, V = p.n, Cc * M
    sumA = sum(len(r) for r in s.rows)
    B = route.ms_batch_tile if batch_tile is None else batch_tile
    S = max(1, int(subtiles))  # sequential sub-tiles per grid step
    RU = route.ms_recompute_u if recompute_u is None else bool(recompute_u)
    BIG = 3.4e38
    f32 = jnp.float32
    alpha_c = None if alpha is None else float(alpha)
    P, q, fwd_parts, inv_parts = _lane_part_fns(s, route.ms_lane_parts)
    row_off = [0]
    for row in s.rows:
        row_off.append(row_off[-1] + len(row))

    i32 = jnp.int32

    def kernel(
        llr_ref,  # (B, n) dtype VMEM block
        bits_ref,  # out: (B, V) uint8 hard bits 0/1
        done_ref,  # out: (B, 1) f32
        iters_ref,  # out: (B, 1) i32
        us_ref,  # scratch: (sumA, B, M) dtype check->var messages u, OR
        #          (3R, B, M) per-layer (m1, m2, sg) stats when RU
        tps_ref,  # scratch: (sumA, B, M) dtype previous extrinsics t'
        va_ref,  # scratch: (B, V) dtype posteriors (carried across iters)
        frozen_ref,  # scratch: (B, V) i32 frozen hard bits 0/1
        fdone_ref,  # scratch: (B, 1) f32
        fiters_ref,  # scratch: (B, 1) i32
    ):
        # all (B, M) logical planes are carried as P lane parts of q lanes
        # (_lane_part_fns); refs are addressed by part slice, so no (B, M)
        # value is ever materialized (no concats / computed-value slices)
        def vparts(base):
            return [
                va_ref[:, base + j * q : base + (j + 1) * q].astype(f32)
                for j in range(P)
            ]

        def eparts(ref, e):
            return [
                ref[e, :, j * q : (j + 1) * q].astype(f32) for j in range(P)
            ]

        def weparts(ref, e, parts):
            for j, x in enumerate(parts):
                ref[e, :, j * q : (j + 1) * q] = x.astype(dtype)

        def run_subtile(io):
            """Decode one batch_tile-wide sub-tile of this grid
            step's IO block; scratch (us/tps/va/frozen/...) is reused
            across sub-tiles, so per-sub-tile VMEM is S-independent."""
            fdone_ref[...] = jnp.zeros((B, 1), f32)
            fiters_ref[...] = jnp.full((B, 1), maxiters, jnp.int32)
            frozen_ref[...] = jnp.zeros((B, V), i32)
            # posteriors initialized ONCE: unlike flooding, the layered schedule
            # carries va across iterations (qc_minsum.py make_ms_decoder_layered)
            va_ref[:, :n] = llr_ref[io]
            if V > n:  # punctured tail = 0 (decoder.rs:382-383)
                va_ref[:, n:] = jnp.zeros((B, V - n), dtype)

            def one_iteration(it, first):
                """One layered iteration; `first` (Python bool) peels iteration
                0 where u = t' = 0: extrinsic t = posterior view, the
                self-correction is vacuous (t' == 0 keeps), and the posterior
                update adds u directly. Bit-exact vs the general body run on
                zero state."""
                def u_old_parts(r, tp):
                    """Recompute the previous iteration's u for one addend
                    of layer r from its stored self-corrected extrinsic t'
                    and the layer's stored (m1, m2, sg) stats — replaying
                    the exact expression that produced it, so the value is
                    bit-identical to a stored u (incl. the storage-dtype
                    round trip, which t' itself carries)."""
                    m1o = eparts(us_ref, 3 * r + 0)
                    m2o = eparts(us_ref, 3 * r + 1)
                    sgo = eparts(us_ref, 3 * r + 2)
                    out = []
                    for j in range(P):
                        if is_int:
                            a1 = jnp.minimum(jnp.abs(tp[j]), sat_hi)
                        else:
                            a1 = jnp.abs(tp[j])
                        mag = jnp.where(a1 == m1o[j], m2o[j], m1o[j])
                        if alpha_c is not None:
                            mag = alpha_c * mag
                        neg = jnp.logical_xor(sgo[j] > 0.0, tp[j] < 0.0)
                        # replicate the storage round trip a stored u
                        # carried (no-op for f32; exact bf16 replay —
                        # matters when alpha makes mag non-representable)
                        out.append(
                            jnp.where(neg, -mag, mag).astype(dtype).astype(f32)
                        )
                    return out

                for r, row in enumerate(s.rows):
                    # pass 1: extrinsics t = va - u with self-correction
                    ts = []
                    u_olds = []
                    for a, perm in enumerate(row):
                        e = row_off[r] + a
                        g = fwd_parts(vparts(perm.col * M), perm)
                        if first:
                            t = g
                        else:
                            if RU:
                                u_old = u_old_parts(r, eparts(tps_ref, e))
                            else:
                                u_old = eparts(us_ref, e)
                            u_olds.append(u_old)
                            t = [gi - ui for gi, ui in zip(g, u_old)]
                            if is_int:  # saturating sub (decoder.rs:46-48)
                                t = [jnp.clip(x, sat_lo, sat_hi) for x in t]
                            # self-correction (decoder.rs:420-426)
                            t = [
                                jnp.where(
                                    jnp.logical_or((x < 0.0) == (tp < 0.0), tp == 0.0),
                                    x, 0.0,
                                )
                                for x, tp in zip(t, eparts(tps_ref, e))
                            ]
                        ts.append(t)
                    # two smallest |t| + sign product across the layer's addends.
                    # The sign product is an exact boolean: accumulate it as an
                    # i1 XOR chain instead of float adds + a mod-2 (saves the
                    # bool->f32 casts and the mul/floor/sub chain per layer —
                    # identical value, Mosaic-census-driven, STATUS.md roofline).
                    # Parts never interact: P independent chains.
                    big0 = sat_hi if is_int else BIG
                    m1 = [jnp.full((B, q), big0, f32) for _ in range(P)]
                    m2 = [
                        jnp.full((B, q), sat_hi, f32) if is_int
                        else jnp.zeros((B, q), f32)
                        for _ in range(P)
                    ]
                    sgb = [jnp.zeros((B, q), jnp.bool_) for _ in range(P)]
                    a1s = []
                    for t in ts:
                        if is_int:  # saturating abs: |-128| -> 127
                            a1 = [jnp.minimum(jnp.abs(x), sat_hi) for x in t]
                        else:
                            a1 = [jnp.abs(x.astype(dtype).astype(f32)) for x in t]
                        a1s.append(a1)
                        for j in range(P):
                            is_new = a1[j] < m1[j]
                            m2[j] = jnp.where(is_new, m1[j], jnp.minimum(m2[j], a1[j]))
                            m1[j] = jnp.minimum(m1[j], a1[j])
                            sgb[j] = jnp.logical_xor(sgb[j], t[j] < 0.0)
                    # pass 2: new u; posterior update va += perm_inv(u - u_old)
                    for a, perm in enumerate(row):
                        e = row_off[r] + a
                        c0 = perm.col * M
                        t = ts[a]
                        u = []
                        for j in range(P):
                            mag = jnp.where(a1s[a][j] == m1[j], m2[j], m1[j])
                            if alpha_c is not None:
                                mag = alpha_c * mag
                            neg = jnp.logical_xor(sgb[j], t[j] < 0.0)
                            u.append(jnp.where(neg, -mag, mag))
                        if first:
                            du = u
                        else:
                            du = [ui - uo for ui, uo in zip(u, u_olds[a])]
                        # the int posterior accumulator stays WIDE — only
                        # messages saturate (qc_minsum.py make_ms_decoder_layered
                        # docstring; bounded by (1+deg)*HI, exact in f32)
                        dv = inv_parts(du, perm)
                        for j in range(P):
                            va_ref[:, c0 + j * q : c0 + (j + 1) * q] += dv[j].astype(
                                dtype
                            )
                        if not RU:
                            weparts(us_ref, e, u)
                        weparts(tps_ref, e, t)
                    if RU:
                        # persist this layer's stats for the NEXT
                        # iteration's u_old recompute (written after every
                        # u_old of this iteration has been consumed; m1/m2
                        # are mins of storage-rounded |t'| values and sg is
                        # 0/1, all exactly representable in the storage
                        # dtype)
                        weparts(us_ref, 3 * r + 0, m1)
                        weparts(us_ref, 3 * r + 1, m2)
                        weparts(
                            us_ref, 3 * r + 2,
                            [sj.astype(f32) for sj in sgb],
                        )
                # end-of-iteration syndrome over the FINAL posteriors (per-layer
                # parities taken mid-sweep are stale — qc_minsum.py layered).
                # Sign planes as i32 0/1 (rolls are bit-pattern moves; i32 skips
                # the sitofp) with i1-XOR parity accumulation; one f32 convert
                # per part only for the lane reduction.
                sign_parts = [
                    [
                        (va_ref[:, c * M + j * q : c * M + (j + 1) * q].astype(f32)
                         < 0.0).astype(i32)
                        for j in range(P)
                    ]
                    for c in range(Cc)
                ]
                ok = jnp.ones((B, 1), f32)
                for r, row in enumerate(s.rows):
                    par = None
                    for perm in row:
                        g = fwd_parts(sign_parts[perm.col], perm)
                        par = g if par is None else [x ^ y for x, y in zip(par, g)]
                    for x in par:
                        parf = x.astype(f32)  # exact 0/1
                        ok = ok * jnp.min(1.0 - parf, axis=1, keepdims=True)
                # ---- freeze converged codewords at this iteration ----
                done = fdone_ref[...]
                newly = ok * (1.0 - done)
                for c in range(Cc):  # reuse the syndrome's sign planes
                    for j in range(P):
                        sl = slice(c * M + j * q, c * M + (j + 1) * q)
                        frozen_ref[:, sl] = jnp.where(
                            newly > 0.0, sign_parts[c][j], frozen_ref[:, sl]
                        )
                fiters_ref[...] = jnp.where(
                    newly > 0.0, jnp.full((B, 1), 1, jnp.int32) * it, fiters_ref[...]
                )
                done = jnp.maximum(done, ok)
                fdone_ref[...] = done
                return done

            done0 = one_iteration(jnp.int32(0), True)

            def iter_body(carry):
                it, _cont = carry
                done = one_iteration(it, False)
                cont = jnp.logical_and(it + 1 < maxiters, jnp.min(done) < 1.0)
                return (it + 1, cont)

            cont0 = jnp.logical_and(1 < maxiters, jnp.min(done0) < 1.0)
            jax.lax.while_loop(lambda c: c[1], iter_body, (jnp.int32(1), cont0))
            done = fdone_ref[...]
            signs = (va_ref[...].astype(f32) < 0.0).astype(i32)
            # values are exactly 0/1 i32: compare-then-cast (bool -> u8)
            bits_ref[io] = (
                jnp.where(done > 0.0, frozen_ref[...], signs) > 0
            ).astype(jnp.uint8)
            done_ref[io] = done
            iters_ref[io] = fiters_ref[...]

        for _si in range(S):
            run_subtile(slice(_si * B, (_si + 1) * B))

    @functools.lru_cache(maxsize=8)
    def build(batch: int):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(batch // (S * B),),
            in_specs=[
                pl.BlockSpec((S * B, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=[
                pl.BlockSpec((S * B, V), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((S * B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((S * B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            # shapes sourced from sizes.py — the memory-table single source
            # of truth (sizes.ms_layered_scratch_specs docstring)
            scratch_shapes=[
                pltpu.VMEM(sh, dt)
                for sh, dt in ms_layered_scratch_specs(
                    sumA, V, M, B, dtype, node_major=False,
                    recompute_u=RU, n_layers=R,
                )
            ],
        )
        return pl.pallas_call(
            kernel,
            out_shape=[
                jax.ShapeDtypeStruct((batch, V), jnp.uint8),
                jax.ShapeDtypeStruct((batch, 1), f32),
                jax.ShapeDtypeStruct((batch, 1), jnp.int32),
            ],
            grid_spec=gs,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )

    @jax.jit
    def decode(llrs: jnp.ndarray) -> MSResult:
        llrs = jnp.asarray(llrs, dtype)
        assert llrs.ndim == 2 and llrs.shape[1] == n, f"llrs must be (B, {n})"
        batch = llrs.shape[0]
        pad = (-batch) % (S * B)
        if pad:
            llrs = jnp.concatenate([llrs, jnp.ones((pad, n), dtype)], axis=0)
        bits_u8, done_f, iters = build(batch + pad)(llrs)
        return MSResult(
            success=done_f[:batch, 0] > 0.0,
            iterations=iters[:batch, 0],
            bits=bits_u8[:batch],
        )

    return decode
