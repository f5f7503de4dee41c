"""VMEM-resident NODE-MAJOR min-sum Pallas kernels (TC codes + M<=256 TM).

The lane-major kernels (ops/pallas_qc.py) put the batch on sublanes and
the M nodes of a block on lanes — the right layout for large TM
submatrices (M >= 512, lane-tile multiples). This module flips it:
**nodes on SUBLANES, batch on LANES** — the node-major (M, B) layout the
XLA QC decoders already use (qc_minsum.py) — and carries every logical
(M, B) plane as a list of PARTS (_part_layout):

  * TC codes (M = 16/32/64): every sub-block is a pure cyclic rotation
    (HI | s only — no HP cells, codes/expand.py `qc_structure`), so a
    plane is ONE part and every permutation is a STATIC SUBLANE roll of
    an (M, B_tile) tile. A (B, M) lane-major plane would waste most of
    the 128 lanes and make every permutation a sub-tile lane roll.
  * TM codes: every rot block is the IDENTITY (shift 0) and every HP
    block a pi permutation = theta quarter-rotation + per-quarter phi
    rolls, so a plane splits into FOUR independent (M/4, B) quarter
    parts that are closed under every permutation: identity keeps parts
    in place, a pi perm reindexes parts and sublane-rolls each — zero
    concatenation or masked-roll data movement (the lane-major kernels
    pay ~26% of their issue slots for the same perms, round-4 census).
    Production dispatch sends M <= 256 (TM1280/TM1536) here — measured
    1.8x their lane-major kernels; for M >= 512 the tall (q, B) parts
    lose to the wide lane layout (`ms_node_major`), though the kernels
    accept every TM code.
  * the batch rides the full 128-wide lanes (B_tile a multiple of 128),
    so every vector op is dense; all part heights (16..512) are
    sublane-tile multiples (8 for f32), so every part slice of the
    stacked state planes is tile-aligned.

As in pallas_qc.py, the grid tiles the batch and one grid step keeps the
entire decode state for its codeword tile in VMEM scratch for the whole
early-exiting iteration loop; HBM traffic per codeword is one LLR read
and one hard-bit write, independent of iteration count.

Algorithm and accumulation order are identical to the XLA decoders:
`make_ms_decoder_pallas_tc_layered` is bit-exact vs
`make_ms_decoder_layered` (qc_minsum.py) and
`make_ms_decoder_pallas_tc_qc` (flooding) vs `make_ms_decoder_qc` —
bits, success AND iteration counts — for f32. The reference algorithm
is `decode_ms` (decoder.rs:347-475, self-corrected min-sum, Savin
arXiv:0803.1090); the layered schedule is the documented divergence
validated statistically (see qc_minsum.make_ms_decoder_layered).

int8/int16 LLRs run saturating int semantics as exact f32 clips, the same
formulation as pallas_qc.py (its module docstring has the exactness
argument): the flooding kernel clamps every add/sub like the reference
(decoder.rs:42-55), the layered kernel saturates messages only and keeps
its carried posterior accumulator wide (see
qc_minsum.make_ms_decoder_layered).

The caller-facing factories in pallas_qc.py auto-dispatch here for
M < 128, so `make_ms_decoder_pallas_qc`/`_layered` cover all 9 codes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..codes.expand import qc_structure
from ..codes.params import LDPCCode, get_code
from ..sizes import (
    bf_scratch_specs,
    ms_flooding_scratch_specs,
    ms_layered_scratch_specs,
)
from .minsum import MSResult

__all__ = [
    "make_ms_decoder_pallas_tc_qc",
    "make_ms_decoder_pallas_tc_layered",
    "make_bf_decoder_pallas_tc",
    "ms_node_major",
    "bf_node_major",
]


def ms_node_major(M: int) -> bool:
    """Production min-sum dispatch boundary (single source of truth for
    the pallas_qc factories and sizes.py): M <= 256 decodes node-major
    here — TC sublane rolls plus the quartered pi parts for
    TM1280/TM1536, measured 1.8x their lane-major kernels — while
    M >= 512 stays on the lane-major pallas_qc kernels (measured: the
    node-major layout loses there — TM8192 0.70M vs 1.80M cw/s,
    TM2048/5120/6144 0.85-0.94x — tall (q, B) parts pay more per
    sublane roll than the wide lane layout pays for its masked rolls)."""
    return M <= 256


def bf_node_major(M: int) -> bool:
    """Production bit-flip dispatch boundary (single source of truth for
    the pallas_bf factory and sizes.py): M <= 256 decodes node-major here
    — TC sublane rolls plus the quartered pi parts for TM1280/TM1536 with
    the erasure voting pass fused part-wise (suite protocol, B=32768:
    TM1280 6.99M vs 2.29M cw/s lane-major, TM1536 6.26M vs 3.45M; steady
    state 75.7M vs 11.2M and 59.5M vs 19.6M cw·iter/s) — while M >= 512
    stays on the lane-major pallas_bf kernels (same layout argument as
    `ms_node_major`: tall (q, B) parts lose to the wide lane layout at
    large M)."""
    return M <= 256


def _part_layout(s):
    """(P, q): every logical (M, B) node-major plane is carried as P
    independent parts of q sublanes each.

    TC prototypes are pure rotations (edge (r*M + i, c*M + (i+s) % M)), so
    the natural unit is the whole block: P=1, q=M, and every permutation
    is one static sublane roll (the check-side view of a var block is
    roll(x, -s); the scatter back roll(x, +s) — identical to
    qc_minsum.perm_rows on axis 0).

    TM prototypes contain ONLY identity blocks (every rot shift is 0 —
    codes/constants.py builds them from HI|0 cells) and pi permutations
    (theta quarter-rotation + per-quarter phi rolls, codes/expand.py). In
    quarters (P=4, q=M/4) BOTH are closed part-wise: identity maps part j
    to part j untouched, and a pi perm maps var part (theta+t)%4 to check
    part t with a static roll of phis[t]. The four parts never mix
    element-wise — min/sign/posterior chains run on each part
    independently — so the kernels below never materialize an (M, B)
    value at all: no concatenation, no sub-tile slicing of computed
    values, zero permutation data movement beyond the per-part sublane
    rolls. (The lane-major kernels in pallas_qc.py pay masked full-width
    lane rolls or 64-lane quarter slices for the same perms — measured as
    ~26% of their issue slots in the round-4 Mosaic census.)
    """
    if any(perm.kind != "rot" for row in s.rows for perm in row):
        assert all(
            perm.kind != "rot" or perm.shift == 0
            for row in s.rows
            for perm in row
        ), "mixed nonzero-rotation + pi prototypes are not quarterable"
        return 4, s.m // 4
    return 1, s.m


def _part_fns(s):
    """fwd/inv block permutations over part lists (see _part_layout).

    fwd: var-side parts -> check-side view (g[i] = x[perm(i)]).
    inv: check-side parts -> var-side scatter (y[perm(i)] = g[i]).
    Each returns a NEW list of (q, B) arrays; inputs are not mutated.
    """
    P, q = _part_layout(s)

    def _roll(x, sh):
        return x if sh == 0 else pltpu.roll(x, sh, axis=0)

    def fwd(parts, perm):
        if perm.kind == "rot":
            if P == 1:
                return [_roll(parts[0], (-perm.shift) % q)]
            return list(parts)  # identity (shift 0 asserted above)
        # check part t reads var part (theta+t)%4 rolled by -phis[t]
        return [
            _roll(parts[(perm.theta + t) % 4], (-perm.phis[t]) % q)
            for t in range(4)
        ]

    def inv(parts, perm):
        if perm.kind == "rot":
            if P == 1:
                return [_roll(parts[0], perm.shift % q)]
            return list(parts)
        # var part v receives check part t=(v-theta)%4 rolled by +phis[t]
        out = []
        for v in range(4):
            t = (v - perm.theta) % 4
            out.append(_roll(parts[t], perm.phis[t] % q))
        return out

    return P, q, fwd, inv


def _node_major_default_tile(code, ms: bool) -> int:
    """Default batch tile for THESE (node-major) kernels: the measured
    per-code production tile from the routing table when the code routes
    node-major; 128 lanes (one lane tile, VMEM-safe at any sumA*M) when a
    lane-major code is forced through here for an off-route experiment
    (e.g. the round-4 tall-parts falsification sweeps on TM8192/TM6144 —
    those pass explicit tiles anyway)."""
    from .routing import NODE_MAJOR, route_for

    route = route_for(code)
    layout = route.ms_layout if ms else route.bf_layout
    if layout == NODE_MAJOR:
        return route.ms_batch_tile if ms else route.bf_batch_tile
    return 128


def _resolve_batch_tile(batch_tile, M, interpret, default):
    """TC kernels put the BATCH on the 128 TPU lanes, so an explicit
    batch_tile must be a lane-tile multiple when compiled for real TPU
    (interpret mode is exempt). Validated here, once, for every dispatcher
    (make_bf_decoder_pallas / make_ms_decoder_pallas_* forward to these
    factories; the TM kernels tile sublanes instead and accept any size)."""
    if batch_tile is None:
        return default
    if not interpret and batch_tile % 128:
        raise ValueError(
            f"TC codes put the batch on the 128 TPU lanes: batch_tile must "
            f"be a multiple of 128 (got {batch_tile}); omit it for the "
            f"measured default"
        )
    return batch_tile


def _check_code(code, dtype, alpha, static_int_err):
    """Shared validation; returns (code, storage dtype, is_int, sat bounds)."""
    code = get_code(code)
    dtype = jnp.dtype(dtype)
    is_int = dtype in (jnp.dtype(jnp.int8), jnp.dtype(jnp.int16))
    sat_lo = sat_hi = None
    if is_int:
        if alpha is not None:
            raise ValueError("the saturating int path does not support alpha")
        sat_lo = float(jnp.iinfo(dtype).min)
        sat_hi = float(jnp.iinfo(dtype).max)
        dtype = jnp.dtype(jnp.float32)
    elif dtype not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        raise ValueError(static_int_err)
    s = qc_structure(code)
    if any(perm.kind != "rot" for row in s.rows for perm in row):
        # pi quarters must be sublane-tile-aligned (f32: 8 rows) and the
        # identity blocks unshifted for the quartered parts to be closed
        # under every perm (_part_layout); true for all six TM codes
        if (s.m // 4) % 8 or any(
            perm.kind == "rot" and perm.shift
            for row in s.rows
            for perm in row
        ):
            raise ValueError(
                "pallas tc decoder requires pure-rotation prototypes or "
                f"quarterable pi prototypes; {code.name} has M={s.m}"
            )
    return code, dtype, is_int, sat_lo, sat_hi, s


def _wrap_decode(build, n, V, B, dtype, transpose_in=True):
    """Shared host-side wrapper: transpose to node-major, pad the batch to
    a tile multiple, run the kernel, transpose back. Padded lanes decode
    garbage that is sliced away (each grid step early-exits its own tile
    independently, so they cannot slow the real lanes)."""

    @jax.jit
    def decode(llrs: jnp.ndarray) -> MSResult:
        llrs = jnp.asarray(llrs, dtype)
        assert llrs.ndim == 2 and llrs.shape[1] == n, f"llrs must be (B, {n})"
        batch = llrs.shape[0]
        pad = (-batch) % B
        if pad:
            llrs = jnp.concatenate([llrs, jnp.ones((pad, n), dtype)], axis=0)
        bits_u8, done_f, iters = build(batch + pad)(llrs.T)
        return MSResult(
            success=done_f[0, :batch] > 0.0,
            iterations=iters[0, :batch],
            bits=bits_u8.T[:batch],
        )

    return decode


def make_ms_decoder_pallas_tc_layered(
    code: LDPCCode | str,
    dtype=jnp.float32,
    maxiters: int = 20,
    alpha: float | None = None,
    batch_tile: int | None = None,
    interpret: bool = False,
):
    """VMEM-resident row-layered self-corrected min-sum for M < 128 codes.

    Same schedule, update rules, and accumulation order as
    `make_ms_decoder_layered` (qc_minsum.py) — f32 is bit-exact against it
    (bits/success/iterations). Returns fn(llrs: (B, n) dtype) -> MSResult.
    """
    code, dtype, is_int, sat_lo, sat_hi, s = _check_code(
        code, dtype, alpha,
        "pallas tc layered decoder supports float32/bfloat16/int8/int16",
    )
    p = code.params
    M, R, Cc = s.m, s.n_block_rows, s.n_block_cols
    n, V = p.n, Cc * M
    sumA = sum(len(r) for r in s.rows)
    B = _resolve_batch_tile(batch_tile, M, interpret,
                            default=_node_major_default_tile(code, ms=True))
    BIG = 3.4e38
    f32 = jnp.float32
    alpha_c = None if alpha is None else float(alpha)
    P, q, fwd, inv = _part_fns(s)
    row_off = [0]
    for row in s.rows:
        row_off.append(row_off[-1] + len(row))

    i32 = jnp.int32

    def kernel(
        llr_ref,  # (n, B) dtype VMEM block (node-major)
        bits_ref,  # out: (V, B) uint8 hard bits 0/1
        done_ref,  # out: (1, B) f32
        iters_ref,  # out: (1, B) i32
        us_ref,  # scratch: (sumA*M, B) dtype  check->var messages u
        tps_ref,  # scratch: (sumA*M, B) dtype previous extrinsics t'
        va_ref,  # scratch: (V, B) dtype posteriors (carried across iters)
        frozen_ref,  # scratch: (V, B) i32 frozen hard bits 0/1
        fdone_ref,  # scratch: (1, B) f32
        fiters_ref,  # scratch: (1, B) i32
    ):
        # all (M, B) logical planes are carried as P parts of q sublanes
        # (part lists — _part_layout); refs are addressed by part slice
        def rparts(ref, base):
            return [
                ref[base + j * q : base + (j + 1) * q, :].astype(f32)
                for j in range(P)
            ]

        def wparts(ref, base, parts):
            for j, x in enumerate(parts):
                ref[base + j * q : base + (j + 1) * q, :] = x.astype(dtype)

        fdone_ref[...] = jnp.zeros((1, B), f32)
        fiters_ref[...] = jnp.full((1, B), maxiters, jnp.int32)
        frozen_ref[...] = jnp.zeros((V, B), i32)
        # posteriors initialized ONCE: the layered schedule carries va
        # across iterations (qc_minsum.py make_ms_decoder_layered)
        va_ref[:n, :] = llr_ref[...]
        if V > n:  # punctured tail = 0 (decoder.rs:382-383)
            va_ref[n:, :] = jnp.zeros((V - n, B), dtype)

        def one_iteration(it, first):
            """One layered iteration; `first` (Python bool) peels iteration
            0 where u = t' = 0 (vacuous self-correction, va += inv(u)
            directly). Bit-exact vs the general body run on zero state."""
            for r, row in enumerate(s.rows):
                # pass 1: extrinsics t = va - u with self-correction
                ts = []
                for a, perm in enumerate(row):
                    e = row_off[r] + a
                    g = fwd(rparts(va_ref, perm.col * M), perm)
                    if first:
                        t = g
                    else:
                        t = [gi - ui for gi, ui in zip(g, rparts(us_ref, e * M))]
                        if is_int:  # saturating sub (decoder.rs:46-48)
                            t = [jnp.clip(x, sat_lo, sat_hi) for x in t]
                        # self-correction (decoder.rs:420-426)
                        t = [
                            jnp.where(
                                jnp.logical_or((x < 0.0) == (tp < 0.0), tp == 0.0),
                                x, 0.0,
                            )
                            for x, tp in zip(t, rparts(tps_ref, e * M))
                        ]
                    ts.append(t)
                # two smallest |t| + sign product across the layer's addends
                # (sign product as an i1 XOR chain — exact boolean, saves
                # the bool->f32 casts + mod-2, see pallas_qc.py); parts
                # never interact: P independent chains
                big0 = sat_hi if is_int else BIG
                m1 = [jnp.full((q, B), big0, f32) for _ in range(P)]
                m2 = [
                    jnp.full((q, B), sat_hi, f32) if is_int
                    else jnp.zeros((q, B), f32)
                    for _ in range(P)
                ]
                sgb = [jnp.zeros((q, B), jnp.bool_) for _ in range(P)]
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
                        du = [
                            ui - uo for ui, uo in zip(u, rparts(us_ref, e * M))
                        ]
                    # the int LAYERED posterior accumulator stays WIDE —
                    # only messages saturate (qc_minsum.py
                    # make_ms_decoder_layered docstring; the flooding
                    # kernel below keeps the reference's transient clip)
                    dv = inv(du, perm)
                    for j in range(P):
                        va_ref[c0 + j * q : c0 + (j + 1) * q, :] += dv[j].astype(
                            dtype
                        )
                    wparts(us_ref, e * M, u)
                    wparts(tps_ref, e * M, t)
            # end-of-iteration syndrome over the FINAL posteriors (i32 sign
            # planes, XOR parity — see pallas_qc.py layered kernel)
            sign_parts = [
                [
                    (va_ref[c * M + j * q : c * M + (j + 1) * q, :].astype(f32)
                     < 0.0).astype(i32)
                    for j in range(P)
                ]
                for c in range(Cc)
            ]
            ok = jnp.ones((1, B), f32)
            for r, row in enumerate(s.rows):
                par = None
                for perm in row:
                    g = fwd(sign_parts[perm.col], perm)
                    par = g if par is None else [x ^ y for x, y in zip(par, g)]
                for x in par:
                    parf = x.astype(f32)  # exact 0/1
                    ok = ok * jnp.min(1.0 - parf, axis=0, keepdims=True)
            # ---- freeze converged codewords at this iteration ----
            done = fdone_ref[...]
            newly = ok * (1.0 - done)
            for c in range(Cc):  # reuse the syndrome's sign planes
                for j in range(P):
                    sl = slice(c * M + j * q, c * M + (j + 1) * q)
                    frozen_ref[sl, :] = jnp.where(
                        newly > 0.0, sign_parts[c][j], frozen_ref[sl, :]
                    )
            fiters_ref[...] = jnp.where(
                newly > 0.0, jnp.full((1, B), 1, jnp.int32) * it, fiters_ref[...]
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
            num_scalar_prefetch=0,
            grid=(batch // B,),
            in_specs=[
                pl.BlockSpec((n, B), lambda i: (0, i), memory_space=pltpu.VMEM)
            ],
            out_specs=[
                pl.BlockSpec((V, B), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            # shapes sourced from sizes.py — the memory-table single source
            # of truth (sizes.ms_layered_scratch_specs docstring)
            scratch_shapes=[
                pltpu.VMEM(sh, dt)
                for sh, dt in ms_layered_scratch_specs(
                    sumA, V, M, B, dtype, node_major=True
                )
            ],
        )
        return pl.pallas_call(
            kernel,
            out_shape=[
                jax.ShapeDtypeStruct((V, batch), jnp.uint8),
                jax.ShapeDtypeStruct((1, batch), f32),
                jax.ShapeDtypeStruct((1, batch), jnp.int32),
            ],
            grid_spec=gs,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )

    return _wrap_decode(build, n, V, B, dtype)


def make_ms_decoder_pallas_tc_qc(
    code: LDPCCode | str,
    dtype=jnp.float32,
    maxiters: int = 20,
    alpha: float | None = None,
    batch_tile: int | None = None,
    interpret: bool = False,
):
    """VMEM-resident FLOODING self-corrected min-sum for M < 128 codes.

    Same schedule, update rules, and accumulation order as
    `make_ms_decoder_qc` (qc_minsum.py) — f32 is bit-exact against it
    (bits/success/iterations); this is the reference's own flooding
    schedule (decoder.rs:347-475). Returns fn(llrs) -> MSResult.
    """
    code, dtype, is_int, sat_lo, sat_hi, s = _check_code(
        code, dtype, alpha,
        "pallas tc qc decoder supports float32/bfloat16/int8/int16",
    )
    p = code.params
    M, R, Cc = s.m, s.n_block_rows, s.n_block_cols
    n, V = p.n, Cc * M
    sumA = sum(len(r) for r in s.rows)
    B = _resolve_batch_tile(batch_tile, M, interpret,
                            default=_node_major_default_tile(code, ms=True))
    BIG = 3.4e38
    f32 = jnp.float32
    alpha_c = None if alpha is None else float(alpha)
    P, q, fwd, inv = _part_fns(s)

    i32 = jnp.int32

    def u_from(v, m1, m2, sg):
        """Check->var message from stats (decoder.rs:388-405); v/m1/m2 f32
        parts, sg the BOOLEAN sign product (see pallas_qc.py)."""
        av = jnp.abs(v)
        mag = jnp.where(av == m1, m2, m1)
        if alpha_c is not None:
            mag = alpha_c * mag
        neg = jnp.logical_xor(sg, v < 0.0)
        return jnp.where(neg, -mag, mag)

    def kernel(
        llr_ref,  # (n, B) dtype VMEM block (node-major)
        bits_ref,  # out: (V, B) uint8
        done_ref,  # out: (1, B) f32
        iters_ref,  # out: (1, B) i32
        vs_ref,  # scratch: (sumA*M, B) dtype  var->check messages
        m1_ref,  # scratch: (R*M, B) dtype
        m2_ref,  # scratch: (R*M, B) dtype
        sg_ref,  # scratch: (R*M, B) i32 (0/1 sign products)
        va_ref,  # scratch: (V, B) dtype posteriors
        frozen_ref,  # scratch: (V, B) i32
        fdone_ref,  # scratch: (1, B) f32
        fiters_ref,  # scratch: (1, B) i32
    ):
        # (M, B) planes carried as P parts of q sublanes (_part_layout)
        def rparts(ref, base):
            return [
                ref[base + j * q : base + (j + 1) * q, :].astype(f32)
                for j in range(P)
            ]

        def wparts(ref, base, parts):
            for j, x in enumerate(parts):
                ref[base + j * q : base + (j + 1) * q, :] = x.astype(dtype)

        # NO zero-init of vs/m1/m2/sg: iteration 0 is PEELED with the
        # reference's zero-state shortcut (u == 0 everywhere), which writes
        # every scratch plane before anything reads them.
        fdone_ref[...] = jnp.zeros((1, B), f32)
        fiters_ref[...] = jnp.full((1, B), maxiters, jnp.int32)
        frozen_ref[...] = jnp.zeros((V, B), i32)

        def one_iteration(it, first):
            """One flooding iteration; `first` specializes the peeled
            iteration 0 (sweep 1 degenerates to va = llr; sweep 2's u is 0
            so nv = g and self-correction always keeps)."""
            # ---- sweep 1: posteriors from llr + all check messages ----
            va_ref[:n, :] = llr_ref[...]
            if V > n:  # punctured tail = 0 (decoder.rs:382-383)
                va_ref[n:, :] = jnp.zeros((V - n, B), dtype)
            if not first:
                e = 0
                for r, row in enumerate(s.rows):
                    m1o = rparts(m1_ref, r * M)
                    m2o = rparts(m2_ref, r * M)
                    sgo = [
                        sg_ref[r * M + j * q : r * M + (j + 1) * q, :] != 0
                        for j in range(P)
                    ]
                    for perm in row:
                        u = [
                            u_from(v, m1o[j], m2o[j], sgo[j])
                            for j, v in enumerate(rparts(vs_ref, e * M))
                        ]
                        c0 = perm.col * M
                        uv = inv(u, perm)
                        for j in range(P):
                            sl = slice(c0 + j * q, c0 + (j + 1) * q)
                            if is_int:  # saturate every add (decoder.rs:46-48)
                                va_ref[sl, :] = jnp.clip(
                                    va_ref[sl, :] + uv[j], sat_lo, sat_hi
                                )
                            else:
                                va_ref[sl, :] += uv[j].astype(dtype)
                        e += 1
            # ---- sweep 2: per-row streamed stats + self-corrected v ----
            # sign products and parities as i1 XOR chains (pallas_qc.py);
            # parts never interact: P independent chains per row
            ok = jnp.ones((1, B), f32)
            e = 0
            for r, row in enumerate(s.rows):
                if not first:
                    m1o = rparts(m1_ref, r * M)
                    m2o = rparts(m2_ref, r * M)
                    sgo = [
                        sg_ref[r * M + j * q : r * M + (j + 1) * q, :] != 0
                        for j in range(P)
                    ]
                big0 = sat_hi if is_int else BIG
                m1n = [jnp.full((q, B), big0, f32) for _ in range(P)]
                m2n = [
                    jnp.full((q, B), sat_hi, f32) if is_int
                    else jnp.zeros((q, B), f32)
                    for _ in range(P)
                ]
                sgc = [jnp.zeros((q, B), jnp.bool_) for _ in range(P)]
                par = [jnp.zeros((q, B), jnp.bool_) for _ in range(P)]
                for perm in row:
                    g = fwd(rparts(va_ref, perm.col * M), perm)
                    if first:
                        nv = g
                    else:
                        vo = rparts(vs_ref, e * M)
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
                    wparts(vs_ref, e * M, nv)
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
                wparts(m1_ref, r * M, m1n)
                wparts(m2_ref, r * M, m2n)
                for j in range(P):
                    sg_ref[r * M + j * q : r * M + (j + 1) * q, :] = sgc[
                        j
                    ].astype(i32)
                    parf = par[j].astype(f32)  # exact 0/1
                    ok = ok * jnp.min(1.0 - parf, axis=0, keepdims=True)
            # ---- freeze converged codewords at this iteration ----
            done = fdone_ref[...]
            newly = ok * (1.0 - done)
            signs = (va_ref[...].astype(f32) < 0.0).astype(i32)
            frozen_ref[...] = jnp.where(newly > 0.0, signs, frozen_ref[...])
            fiters_ref[...] = jnp.where(
                newly > 0.0, jnp.full((1, B), 1, jnp.int32) * it, fiters_ref[...]
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
        bits_ref[...] = (
            jnp.where(done > 0.0, frozen_ref[...], signs) > 0
        ).astype(jnp.uint8)
        done_ref[...] = done
        iters_ref[...] = fiters_ref[...]

    @functools.lru_cache(maxsize=8)
    def build(batch: int):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(batch // B,),
            in_specs=[
                pl.BlockSpec((n, B), lambda i: (0, i), memory_space=pltpu.VMEM)
            ],
            out_specs=[
                pl.BlockSpec((V, B), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            # shapes sourced from sizes.py — the memory-table single source
            # of truth (sizes.ms_flooding_scratch_specs docstring)
            scratch_shapes=[
                pltpu.VMEM(sh, dt)
                for sh, dt in ms_flooding_scratch_specs(
                    sumA, R, V, M, B, dtype, node_major=True
                )
            ],
        )
        return pl.pallas_call(
            kernel,
            out_shape=[
                jax.ShapeDtypeStruct((V, batch), jnp.uint8),
                jax.ShapeDtypeStruct((1, batch), f32),
                jax.ShapeDtypeStruct((1, batch), jnp.int32),
            ],
            grid_spec=gs,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )

    return _wrap_decode(build, n, V, B, dtype)


def make_bf_decoder_pallas_tc(
    code: LDPCCode | str,
    maxiters: int = 20,
    batch_tile: int | None = None,
    interpret: bool = False,
):
    """VMEM-resident Gallager bit-flip decoder, node-major (M <= 256).

    Same flip-all-at-max algorithm as the reference `decode_bf`
    (decoder.rs:243-301) in the QC roll formulation of
    `ops.bitflip.make_bf_decoder_qc`, and bit-exact against it (integer
    counts carried in f32 lanes are exact; the flip rule is deterministic).
    The large-M analog is `ops.pallas_bf.make_bf_decoder_pallas`; this is
    its transposed (node-major) small-M twin: bits live as (V, B) planes
    with nodes on sublanes and the batch on the 128-wide lanes, carried as
    parts (`_part_layout`) exactly like the min-sum kernels above — TC
    block permutations are static sublane rolls of whole planes; the
    punctured TM codes (TM1280/TM1536) split each plane into four
    quarter parts closed under every pi permutation. Per block row the
    iteration loop costs one roll+add sweep for parity and one for the
    violation scatter, with the whole per-tile state (2 (V, B) f32
    planes) resident in VMEM across the early-exiting `while_loop`.

    Punctured codes run the erasure preprocessor (decode_erasures_bits'
    single voting pass, decoder.rs:144-223) inside the kernel, and the
    node-major layout makes it nearly free: the erased set is exactly the
    final block column (punctured_bits == M for every TM code), so each
    check row's erased-neighbor count is the COMPILE-TIME number of its
    edges into that block — rows where it differs from 1 contribute no
    votes and are skipped entirely at trace time; voting rows pay one
    parity sweep plus a single part-wise scatter into the erased block
    (the lane-major kernel instead carries runtime erased masks and
    scatters votes to every block).

    Returns fn(hard_bits: (B, n) any int dtype) -> BFResult.
    """
    from .bitflip import BFResult

    code = get_code(code)
    p = code.params
    s = qc_structure(code)
    M, R, Cc = s.m, s.n_block_rows, s.n_block_cols
    if not bf_node_major(M):
        raise ValueError(
            f"pallas tc bf decoder is the small-M path (M <= 256); "
            f"{code.name} has M={M} — use make_bf_decoder_pallas"
        )
    if any(perm.kind != "rot" for row in s.rows for perm in row):
        # quartered pi parts need tile-aligned quarters and unshifted
        # identity blocks — true for all six TM codes (see _check_code)
        if (s.m // 4) % 8 or any(
            perm.kind == "rot" and perm.shift
            for row in s.rows
            for perm in row
        ):
            raise ValueError(
                "pallas tc bf decoder requires pure-rotation prototypes or "
                f"quarterable pi prototypes; {code.name} has M={M}"
            )
    n, V = p.n, Cc * M
    if p.punctured_bits:
        # the fused erasure pass assumes the erased set is exactly the
        # final block column (true for every punctured CCSDS TM code)
        assert p.punctured_bits == M and n == (Cc - 1) * M, code.name
    B = _resolve_batch_tile(batch_tile, M, interpret,
                            default=_node_major_default_tile(code, ms=False))
    f32 = jnp.float32
    P, q, fwd, inv = _part_fns(s)

    def kernel(
        in_ref,  # (V, B) f32 hard bits 0/1 (punctured tail zeroed)
        bits_ref,  # out: (V, B) uint8
        done_ref,  # out: (1, B) f32
        iters_ref,  # out: (1, B) i32
        b_ref,  # scratch: (V, B) f32 working bits
        viol_ref,  # scratch: (V, B) f32 violation counts / erasure votes
        fdone_ref,  # scratch: (1, B) f32
        fiters_ref,  # scratch: (1, B) i32
    ):
        # every (M, B) block plane is carried as P parts of q sublanes
        def rblk(ref, c):
            return [ref[c * M + j * q : c * M + (j + 1) * q, :] for j in range(P)]

        def row_parity(r):
            """Mod-2 parity parts of block row r over the working bits."""
            par = None
            for perm in s.rows[r]:
                g = fwd(rblk(b_ref, perm.col), perm)
                par = g if par is None else [x + y for x, y in zip(par, g)]
            return [x - 2.0 * jnp.floor(x * 0.5) for x in par]

        fdone_ref[...] = jnp.zeros((1, B), f32)
        fiters_ref[...] = jnp.full((1, B), maxiters, jnp.int32)
        b_ref[...] = in_ref[...]

        if p.punctured_bits > 0:
            # one erasure voting pass (decode_erasures_bits semantics,
            # decoder.rs:172-218): the punctured tail is zero so the
            # parity over non-erased bits is the parity of the planes;
            # checks with exactly one erased neighbor (a trace-time count
            # here — see the factory docstring) vote +1 on parity 1 / -1
            # on parity 0, and erased vars with positive totals become 1.
            c_e = Cc - 1
            viol_ref[...] = jnp.zeros((V, B), f32)
            for r in range(R):
                e_perms = [perm for perm in s.rows[r] if perm.col == c_e]
                if len(e_perms) != 1:
                    continue  # ecount != 1: no votes from this row
                vote = [2.0 * x - 1.0 for x in row_parity(r)]
                dv = inv(vote, e_perms[0])
                for j in range(P):
                    sl = slice(c_e * M + j * q, c_e * M + (j + 1) * q)
                    viol_ref[sl, :] += dv[j]
            for j in range(P):
                sl = slice(c_e * M + j * q, c_e * M + (j + 1) * q)
                b_ref[sl, :] = jnp.where(
                    viol_ref[sl, :] > 0.0, 1.0, b_ref[sl, :]
                )

        def one_iteration(it):
            # check parities per block row: f32 adds of rolled bit planes,
            # one mod-2 per row; then scatter the parity back to the row's
            # variables as violation counts (decoder.rs:263-287)
            viol_ref[...] = jnp.zeros((V, B), f32)
            for r in range(R):
                par = row_parity(r)
                for perm in s.rows[r]:
                    c0 = perm.col * M
                    dv = inv(par, perm)
                    for j in range(P):
                        viol_ref[c0 + j * q : c0 + (j + 1) * q, :] += dv[j]
            # per-codeword max violation over all V variables (sublanes)
            mx = jnp.max(viol_ref[...], axis=0, keepdims=True)  # (1, B)
            ok = jnp.where(mx == 0.0, 1.0, 0.0)
            # flip ALL variables at the max (decoder.rs:288-296); converged
            # codewords have mx == 0 and freeze naturally
            flip = jnp.logical_and(viol_ref[...] == mx, mx > 0.0)
            b_ref[...] = jnp.where(flip, 1.0 - b_ref[...], b_ref[...])
            done = fdone_ref[...]
            newly = ok * (1.0 - done)
            fiters_ref[...] = jnp.where(
                newly > 0.0, jnp.full((1, B), 1, jnp.int32) * it, fiters_ref[...]
            )
            done = jnp.maximum(done, ok)
            fdone_ref[...] = done
            return done

        def iter_body(carry):
            it, _cont = carry
            done = one_iteration(it)
            cont = jnp.logical_and(it + 1 < maxiters, jnp.min(done) < 1.0)
            return (it + 1, cont)

        jax.lax.while_loop(
            lambda c: c[1], iter_body, (jnp.int32(0), jnp.bool_(maxiters > 0))
        )
        bits_ref[...] = (b_ref[...] > 0.0).astype(jnp.uint8)
        done_ref[...] = fdone_ref[...]
        iters_ref[...] = fiters_ref[...]

    @functools.lru_cache(maxsize=8)
    def build(batch: int):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(batch // B,),
            in_specs=[
                pl.BlockSpec((V, B), lambda i: (0, i), memory_space=pltpu.VMEM)
            ],
            out_specs=[
                pl.BlockSpec((V, B), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            # shapes sourced from sizes.py (sizes.bf_scratch_specs)
            scratch_shapes=[
                pltpu.VMEM(sh, dt)
                for sh, dt in bf_scratch_specs(V, B, node_major=True)
            ],
        )
        return pl.pallas_call(
            kernel,
            out_shape=[
                jax.ShapeDtypeStruct((V, batch), jnp.uint8),
                jax.ShapeDtypeStruct((1, batch), f32),
                jax.ShapeDtypeStruct((1, batch), jnp.int32),
            ],
            grid_spec=gs,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )

    @jax.jit
    def decode(hard_bits: jnp.ndarray) -> BFResult:
        assert hard_bits.ndim == 2 and hard_bits.shape[1] == n, (
            f"hard_bits must be (B, {n})"
        )
        batch = hard_bits.shape[0]
        planes = jnp.asarray(hard_bits, f32).T
        if V > n:
            # punctured tail zeroed; the erasure repair happens in-kernel
            # and its accounting contributes 0 to `iterations` (the
            # reference quirk — decoder.rs:205-218, ops/bitflip.py)
            planes = jnp.concatenate(
                [planes, jnp.zeros((V - n, batch), f32)], axis=0
            )
        pad = (-batch) % B
        if pad:
            # all-zero pad codewords satisfy every check and exit immediately
            planes = jnp.concatenate([planes, jnp.zeros((V, pad), f32)], axis=1)
        bits_u8, done_f, iters = build(batch + pad)(planes)
        return BFResult(
            success=done_f[0, :batch] > 0.0,
            iterations=iters[0, :batch],
            bits=bits_u8.T[:batch],
        )

    return decode
