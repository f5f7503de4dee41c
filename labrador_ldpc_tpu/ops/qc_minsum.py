"""Fast QC-structured self-corrected min-sum decoder (roll-based, gather-free).

This is the production TPU path for soft decoding. It exploits the
quasi-cyclic protograph structure of the CCSDS codes (codes/expand.py:
`qc_structure`): every nonzero M x M sub-block of H is a PERMUTATION matrix
that decomposes into circular shifts (HI | s) or a quarter-rotation plus
per-quarter circular shifts (HP | K, compact_parity_checks.rs:107-108).

Consequently all check<->variable message movement is expressed as static
`jnp.roll`s along the node axis — zero gathers, zero index tables, zero
scatter. State is laid out node-major (M, B) per block so the batch rides
the 128-wide VPU lanes and rolls are contiguous sublane copies. Messages
live per-addend as (A_r, M, B) stacks; check reductions (min1/min2, sign
product, parity) are tiny axis-0 reductions over the prototype row degree
(3..19 addends).

The algorithm is the same normalization-free self-corrected min-sum as the
reference `decode_ms` (decoder.rs:347-475, Savin arXiv:0803.1090) with
identical update rules, early termination (per-codeword done masking under
one `lax.while_loop`), and hard-decision convention (negative -> 1). The
only divergence from the slower reference-order implementation
(ops/minsum.py) is floating-point accumulation ORDER at variable nodes,
which can differ in ULPs; decoded outputs are validated to match on
converged codewords and on BER statistics (tests/test_qc.py).

Float dtypes only (float32/bfloat16); use ops/minsum.py for the saturating
int8/int16 paths that need the reference's exact accumulation order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..codes.expand import BlockPerm, qc_structure
from ..codes.params import LDPCCode, get_code
from .convert import unpack_bits
from .minsum import MSResult

# MSB-first packing weights for the in-loop bit freeze
_MSB_W = np.array([128, 64, 32, 16, 8, 4, 2, 1], dtype=np.uint8)[None, :, None]

__all__ = [
    "make_ms_decoder_qc",
    "make_ms_decoder_layered",
    "make_ms_decoder_qc_i8",
    "make_ms_decoder_qc_int",
    "perm_rows",
]


def perm_rows(x: jnp.ndarray, perm: BlockPerm, inverse: bool = False) -> jnp.ndarray:
    """Apply an M x M block permutation to the leading axis of x: (M, ...).

    Forward:  out[i] = x[perm(i)]   (check-side view of a var block)
    Inverse:  out[perm(i)] = x[i]   (scatter check-side values to var side)
    """
    m = x.shape[0]
    if perm.kind == "rot":
        # out[i] = x[(i + s) % M]  <=>  roll by -s
        return jnp.roll(x, perm.shift if inverse else -perm.shift, axis=0)
    q = m // 4
    parts = []
    for t in range(4):  # output quarter
        if inverse:
            j = (t - perm.theta) % 4  # source quarter within check-side x
            parts.append(jnp.roll(x[j * q : (j + 1) * q], perm.phis[j], axis=0))
        else:
            s = (perm.theta + t) % 4  # source var-side quarter
            parts.append(jnp.roll(x[s * q : (s + 1) * q], -perm.phis[t], axis=0))
    return jnp.concatenate(parts, axis=0)


def make_ms_decoder_qc(
    code: LDPCCode | str,
    dtype=jnp.float32,
    maxiters: int = 20,
    alpha: float | None = None,
):
    """Build a jitted batched QC min-sum decoder.

    Returns fn(llrs: (B, n) dtype) -> MSResult. Positive LLRs favor bit 0.
    `alpha` (normalized min-sum) scales the check magnitudes; None keeps the
    reference's plain self-corrected min-sum.
    """
    code = get_code(code)
    p = code.params
    dtype = jnp.dtype(dtype)
    if dtype not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float64)):
        raise ValueError("QC decoder supports float dtypes; use ops.minsum for int LLRs")
    s = qc_structure(code)
    M, R, Cc = s.m, s.n_block_rows, s.n_block_cols
    n = p.n
    n_blocks = n // M  # transmitted blocks; remaining Cc - n_blocks are punctured
    alpha_c = None if alpha is None else jnp.array(alpha, dtype=dtype)

    def decode(llrs: jnp.ndarray) -> MSResult:
        llrs = jnp.asarray(llrs, dtype=dtype)
        assert llrs.ndim == 2 and llrs.shape[1] == n, f"llrs must be (B, {n})"
        B = llrs.shape[0]
        # flat tuple of (M, B) node-major blocks; punctured tail = 0
        # (decoder.rs:382-383). Kept unstacked so the loop body never slices
        # a stacked array.
        llr_t = llrs.T
        zero_blk = jnp.zeros((M, B), dtype)
        llr_blocks = [llr_t[c * M : (c + 1) * M] for c in range(n_blocks)] + [
            zero_blk for _ in range(Cc - n_blocks)
        ]

        big = float(jnp.finfo(dtype).max)

        def u_from(v, m1, m2, sg):
            """Recompute check->var message from stats (decoder.rs:388-405).
            Cheaper than carrying u between sweeps: it is a pure function of
            (v, min1, min2, sign product), and recomputing saves a full
            |E|-sized read+write of HBM traffic per iteration."""
            mag = jnp.where(jnp.abs(v) == m1, m2, m1)
            if alpha_c is not None:
                mag = alpha_c * mag
            neg = jnp.logical_xor(sg, v < 0)
            return jnp.where(neg, -mag, mag)

        def body_fn(state):
            vs, min1, min2, sgn, done, iters, state_bits, it = state
            # vs: FLAT tuple of sumA (M, B) arrays — carrying per-addend
            # blocks (not (A_r, M, B) stacks) lets XLA update the loop state
            # in place; stacked carries cost a slice + restack copy of the
            # whole message set every iteration (visible as copy-start pairs
            # in the profile). min1/min2/sgn: tuples of (M, B) per row.

            # ---- sweep 1: u from min1/min2 + signs; accumulate marginals ----
            with jax.named_scope("ms_var_sweep"):
                va = [llr_blocks[c] for c in range(Cc)]
                e = 0
                for r in range(R):
                    for perm in s.rows[r]:
                        u = u_from(vs[e], min1[r], min2[r], sgn[r])
                        va[perm.col] = va[perm.col] + perm_rows(u, perm, inverse=True)
                        e += 1

            # ---- sweep 2: self-corrected v; check stats; parity -------------
            # streamed per addend; u recomputed rather than stored
            new_vs, new_min1, new_min2, new_sgn = [], [], [], []
            ok = jnp.ones((B,), bool)
            e = 0
            for r in range(R):
                m1 = jnp.full((M, B), big, dtype)
                m2 = m1
                sg_cnt = jnp.zeros((M, B), jnp.int32)
                par = jnp.zeros((M, B), jnp.int32)
                for perm in s.rows[r]:
                    v_old = vs[e]
                    u = u_from(v_old, min1[r], min2[r], sgn[r])
                    g = perm_rows(va[perm.col], perm)
                    nv = g - u
                    keep = jnp.logical_or((nv < 0) == (v_old < 0), v_old == 0)
                    nv = jnp.where(keep, nv, jnp.zeros((), dtype))  # (decoder.rs:420-426)
                    par = par + (g < 0).astype(jnp.int32)
                    a1 = jnp.abs(nv)
                    is_new_min = a1 < m1
                    m2 = jnp.where(is_new_min, m1, jnp.minimum(m2, a1))
                    m1 = jnp.minimum(m1, a1)
                    sg_cnt = sg_cnt + (nv < 0).astype(jnp.int32)
                    new_vs.append(nv)
                    e += 1
                ok = jnp.logical_and(ok, ((par & 1) == 0).all(axis=0))
                new_min1.append(m1)
                new_min2.append(m2)
                new_sgn.append((sg_cnt & 1).astype(bool))

            # freeze hard decisions at each codeword's convergence iteration,
            # bit-PACKED (V/8 bytes per lane) and packed PER BLOCK — a
            # jnp.stack(va) here would copy the whole marginal set every
            # iteration just to feed the reshape
            packed = jnp.concatenate(
                [
                    ((va[c] < 0).reshape(M // 8, 8, B).astype(jnp.uint8) * _MSB_W)
                    .sum(axis=1)
                    .astype(jnp.uint8)
                    for c in range(Cc)
                ],
                axis=0,
            )
            newly_done = jnp.logical_and(ok, jnp.logical_not(done))
            bits_out = jnp.where(done[None, :], state_bits, packed)
            iters = jnp.where(newly_done, it, iters)
            done = jnp.logical_or(done, ok)
            return (
                tuple(new_vs),
                tuple(new_min1),
                tuple(new_min2),
                tuple(new_sgn),
                done,
                iters,
                bits_out,
                it + 1,
            )

        def cond_fn(state):
            *_, done, _iters, _bits, it = state
            return jnp.logical_and(it < maxiters, jnp.logical_not(done.all()))

        z = jnp.zeros((M, B), dtype)
        sumA = sum(len(row) for row in s.rows)
        state = (
            tuple(z for _ in range(sumA)),  # flat per-addend messages
            tuple(z for _ in range(R)),  # min1 = 0 (decoder.rs:374)
            tuple(z for _ in range(R)),  # min2 = 0
            tuple(jnp.zeros((M, B), bool) for _ in range(R)),
            jnp.zeros((B,), bool),
            jnp.full((B,), maxiters, jnp.int32),
            jnp.zeros((Cc * M // 8, B), jnp.uint8),  # packed bits (set on iter 0)
            jnp.zeros((), jnp.int32),
        )
        *_, done, iters, bits_out, _ = jax.lax.while_loop(cond_fn, body_fn, state)
        bits = unpack_bits(bits_out.T)  # (B, V) uint8
        return MSResult(success=done, iterations=iters, bits=bits)

    return jax.jit(decode)


def make_ms_decoder_layered(
    code: LDPCCode | str,
    dtype=jnp.float32,
    maxiters: int = 20,
    alpha: float | None = None,
    self_corrected: bool = True,
):
    """Row-layered self-corrected min-sum decoder (opt-in fast variant).

    Standard layered scheduling for QC-LDPC: block-rows of H are processed
    SEQUENTIALLY within one iteration, each layer consuming the posteriors
    `va` already updated by the previous layers. Information propagates R
    times faster through the graph than under the reference's flooding
    schedule, so the decoder typically needs about half the iterations for
    the same BER — a deliberate, documented divergence from the reference
    algorithm (decoder.rs:347-475 is flooding); outputs are validated
    statistically (waterfall parity) rather than bit-exactly.

    `self_corrected` applies the reference's oscillation-erasure rule
    (decoder.rs:420-426, Savin arXiv:0803.1090) to the layered extrinsics.
    `alpha` optionally adds min-sum normalization (None = plain).

    int8/int16 dtypes run saturating MESSAGE arithmetic — extrinsics t and
    check messages u clamp to the dtype range with saturating abs
    (|-128| -> 127), exactly as the reference clamps its DecodeFrom
    messages (decoder.rs:42-55) — but the layered POSTERIOR accumulator is
    WIDE (int32 compute, never clipped). This is a deliberate, measured
    divergence from naively saturating every add: the reference's flooding
    schedule recomputes posteriors from scratch each iteration
    (decoder.rs:433-441), so its posterior clipping is transient, while a
    layered schedule CARRIES the posterior across layers and iterations
    and in-place clipping compounds — measured TM8192@1.1dB int8 scale 16:
    3261/4096 frame errors with a clipped accumulator vs 168/4096 wide —
    BETTER than the reference-semantics flooding int8 path's 337 (the
    layered schedule's convergence advantage carries over; anchor in
    benchmarks/results/ber_regression_points_i8.csv).
    The accumulator is bounded by (1 + var-degree) * HI, so int32 (and the
    Pallas kernels' f32) hold it exactly. The update/clip sequence matches
    the Pallas layered int kernels bit-for-bit (tests/test_pallas.py,
    tests/test_pallas_tc.py). alpha is float-only.

    Returns fn(llrs: (B, n) dtype) -> MSResult.
    """
    code = get_code(code)
    p = code.params
    dtype = jnp.dtype(dtype)
    is_int = dtype in (jnp.dtype(jnp.int8), jnp.dtype(jnp.int16))
    if is_int:
        if alpha is not None:
            raise ValueError("the saturating int layered path does not support alpha")
        LO, HI = int(jnp.iinfo(dtype).min), int(jnp.iinfo(dtype).max)
    elif dtype not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float64)):
        raise ValueError("layered decoder supports float32/bfloat16/float64/int8/int16")
    s = qc_structure(code)
    M, R, Cc = s.m, s.n_block_rows, s.n_block_cols
    n = p.n
    n_blocks = n // M
    alpha_c = None if alpha is None else jnp.array(alpha, dtype=dtype)
    # compute dtype: ints upcast to int32 so every saturation point is an
    # explicit clip (identical values to the Pallas kernel's f32-with-clips)
    cdt = jnp.int32 if is_int else dtype

    def decode(llrs: jnp.ndarray) -> MSResult:
        llrs = jnp.asarray(llrs, dtype=dtype)
        assert llrs.ndim == 2 and llrs.shape[1] == n, f"llrs must be (B, {n})"
        B = llrs.shape[0]
        llr_t = llrs.T.astype(cdt)
        zero_blk = jnp.zeros((M, B), cdt)
        llr_blocks = tuple(llr_t[c * M : (c + 1) * M] for c in range(n_blocks)) + tuple(
            zero_blk for _ in range(Cc - n_blocks)
        )
        # two-min sentinel: the int path seeds min1/min2 at the saturation
        # point (decoder.rs:42-55 via make_ms_decoder_qc_int); for floats the
        # seed is dead after the first addend (every finite a1 < big)
        big = HI if is_int else float(jnp.finfo(dtype).max)

        row_off = [0]
        for row in s.rows:
            row_off.append(row_off[-1] + len(row))

        def body_fn(state):
            us, tps, va, done, iters, state_bits, it = state
            # us: FLAT tuple of sumA (M, B) check->var messages (stacked
            # carries cost a slice+restack copy per iteration);
            # tps: previous (self-corrected) extrinsics, same layout;
            # va: flat tuple of Cc (M, B) posteriors (updated layer by layer).
            va = list(va)
            new_us = list(us)
            new_tps = list(tps)
            for r in range(R):
                # extrinsic t = va - u for each addend of this layer,
                # with the reference's self-correction (zero on sign flip)
                ts = []
                for a, perm in enumerate(s.rows[r]):
                    e = row_off[r] + a
                    g = perm_rows(va[perm.col], perm)
                    t = g - us[e].astype(cdt)
                    if is_int:  # saturating sub (decoder.rs:46-48)
                        t = jnp.clip(t, LO, HI)
                    if self_corrected:
                        tp = tps[e].astype(cdt)
                        keep = jnp.logical_or((t < 0) == (tp < 0), tp == 0)
                        t = jnp.where(keep, t, jnp.zeros((), cdt))
                    ts.append(t)
                # two smallest |t| + sign product across the layer's addends
                m1 = jnp.full((M, B), big, cdt)
                m2 = m1
                sg_cnt = jnp.zeros((M, B), jnp.int32)
                a1s = []
                for t in ts:
                    if is_int:  # saturating abs: |-128| -> 127
                        a1 = jnp.minimum(jnp.abs(t), HI)
                    else:
                        a1 = jnp.abs(t)
                    a1s.append(a1)
                    is_new_min = a1 < m1
                    m2 = jnp.where(is_new_min, m1, jnp.minimum(m2, a1))
                    m1 = jnp.minimum(m1, a1)
                    sg_cnt = sg_cnt + (t < 0).astype(jnp.int32)
                sg = (sg_cnt & 1).astype(bool)
                for a, perm in enumerate(s.rows[r]):
                    e = row_off[r] + a
                    t = ts[a]
                    mag = jnp.where(a1s[a] == m1, m2, m1)
                    if alpha_c is not None:
                        mag = alpha_c * mag
                    neg = jnp.logical_xor(sg, t < 0)
                    u = jnp.where(neg, -mag, mag)
                    # va <- t + u_new, i.e. va += perm_inv(u_new - u_old);
                    # the int accumulator stays WIDE (module docstring) —
                    # only messages saturate
                    du = perm_rows(u - us[e].astype(cdt), perm, inverse=True)
                    va[perm.col] = va[perm.col] + du
                    new_us[e] = u.astype(dtype)
                    new_tps[e] = t.astype(dtype)

            # end-of-iteration syndrome over the FINAL posteriors: per-layer
            # parities taken mid-sweep are stale (later layers may flip bits
            # earlier checks relied on). Signs are uint8 planes, so these
            # extra rolls move 1/4 the bytes of the message rolls.
            signs = [(va[c] < 0).astype(jnp.uint8) for c in range(Cc)]
            ok = jnp.ones((B,), bool)
            for r in range(R):
                par = jnp.zeros((M, B), jnp.uint8)
                for perm in s.rows[r]:
                    par = par ^ perm_rows(signs[perm.col], perm)
                ok = jnp.logical_and(ok, (par == 0).all(axis=0))

            packed = jnp.concatenate(
                [
                    ((va[c] < 0).reshape(M // 8, 8, B).astype(jnp.uint8) * _MSB_W)
                    .sum(axis=1)
                    .astype(jnp.uint8)
                    for c in range(Cc)
                ],
                axis=0,
            )
            newly_done = jnp.logical_and(ok, jnp.logical_not(done))
            bits_out = jnp.where(done[None, :], state_bits, packed)
            iters = jnp.where(newly_done, it, iters)
            done = jnp.logical_or(done, ok)
            return tuple(new_us), tuple(new_tps), tuple(va), done, iters, bits_out, it + 1

        def cond_fn(state):
            _, _, _, done, _iters, _bits, it = state
            return jnp.logical_and(it < maxiters, jnp.logical_not(done.all()))

        sumA = sum(len(row) for row in s.rows)
        state = (
            tuple(jnp.zeros((M, B), dtype) for _ in range(sumA)),
            tuple(jnp.zeros((M, B), dtype) for _ in range(sumA)),
            llr_blocks,
            jnp.zeros((B,), bool),
            jnp.full((B,), maxiters, jnp.int32),
            jnp.zeros((Cc * M // 8, B), jnp.uint8),
            jnp.zeros((), jnp.int32),
        )
        *_, done, iters, bits_out, _ = jax.lax.while_loop(cond_fn, body_fn, state)
        bits = unpack_bits(bits_out.T)  # (B, V)
        return MSResult(success=done, iterations=iters, bits=bits)

    return jax.jit(decode)


def make_ms_decoder_qc_i8(
    code: LDPCCode | str,
    maxiters: int = 20,
):
    """Backward-compatible alias for make_ms_decoder_qc_int(code, int8)."""
    return make_ms_decoder_qc_int(code, jnp.int8, maxiters)


def make_ms_decoder_qc_int(
    code: LDPCCode | str,
    dtype=jnp.int8,
    maxiters: int = 20,
):
    """QC roll-based self-corrected min-sum with int8/int16 messages.

    The fast low-precision mode: message/marginal storage is int8 or int16
    (4x / 2x less roll traffic than f32), arithmetic is saturating via
    int32 intermediates — the same saturation semantics as the reference's
    i8/i16 `DecodeFrom` (decoder.rs:42-55: clamp to the dtype range at
    every add/sub, |x| clamped to the max), though accumulation ORDER
    follows the QC block order rather than the reference's edge order, so
    results are validated statistically and on decode outcomes
    (ops/minsum.py keeps the bit-exact int paths).

    Returns fn(llrs: (B, n) dtype) -> MSResult.
    """
    code = get_code(code)
    p = code.params
    dtype = jnp.dtype(dtype)
    if dtype not in (jnp.dtype(jnp.int8), jnp.dtype(jnp.int16)):
        raise ValueError(f"QC int decoder supports int8/int16, got {dtype.name}")
    s = qc_structure(code)
    M, R, Cc = s.m, s.n_block_rows, s.n_block_cols
    n = p.n
    n_blocks = n // M
    LO, HI = int(jnp.iinfo(dtype).min), int(jnp.iinfo(dtype).max)

    def sat(x32):
        return jnp.clip(x32, LO, HI)

    def decode(llrs: jnp.ndarray) -> MSResult:
        llrs = jnp.asarray(llrs, dtype)
        assert llrs.ndim == 2 and llrs.shape[1] == n, f"llrs must be (B, {n})"
        B = llrs.shape[0]
        llr_t = llrs.T.astype(jnp.int32)
        zero_blk = jnp.zeros((M, B), jnp.int32)
        llr_blocks = [llr_t[c * M : (c + 1) * M] for c in range(n_blocks)] + [
            zero_blk for _ in range(Cc - n_blocks)
        ]

        def u_from(v, m1, m2, sg):
            """v/m1/m2: int32 (values within int8 range); sg: bool."""
            mag = jnp.where(jnp.abs(v) == m1, m2, m1)
            neg = jnp.logical_xor(sg, v < 0)
            return jnp.where(neg, -mag, mag)

        row_off = [0]
        for row in s.rows:
            row_off.append(row_off[-1] + len(row))

        def body_fn(state):
            vs, min1, min2, sgn, done, iters, state_bits, it = state
            # vs: FLAT tuple of sumA int8 (M, B) blocks (stacked carries
            # cost a slice+restack copy per iteration); int32 compute

            # sweep 1: marginals with per-step saturation (decoder.rs:46-48)
            va = [llr_blocks[c] for c in range(Cc)]
            for r in range(R):
                m1o = min1[r].astype(jnp.int32)
                m2o = min2[r].astype(jnp.int32)
                for a, perm in enumerate(s.rows[r]):
                    e = row_off[r] + a
                    u = u_from(vs[e].astype(jnp.int32), m1o, m2o, sgn[r])
                    va[perm.col] = sat(va[perm.col] + perm_rows(u, perm, inverse=True))

            # sweep 2: self-corrected v; streamed stats; parity
            new_vs, new_min1, new_min2, new_sgn = [], [], [], []
            ok = jnp.ones((B,), bool)
            for r in range(R):
                m1o = min1[r].astype(jnp.int32)
                m2o = min2[r].astype(jnp.int32)
                m1 = jnp.full((M, B), HI, jnp.int32)
                m2 = m1
                sg_cnt = jnp.zeros((M, B), jnp.int32)
                par = jnp.zeros((M, B), jnp.int32)
                for a, perm in enumerate(s.rows[r]):
                    e = row_off[r] + a
                    v_old = vs[e].astype(jnp.int32)
                    u = u_from(v_old, m1o, m2o, sgn[r])
                    g = perm_rows(va[perm.col], perm)
                    nv = sat(g - u)
                    keep = jnp.logical_or((nv < 0) == (v_old < 0), v_old == 0)
                    nv = jnp.where(keep, nv, 0)
                    par = par + (g < 0).astype(jnp.int32)
                    a1 = jnp.minimum(jnp.abs(nv), HI)  # saturating_abs
                    is_new_min = a1 < m1
                    m2 = jnp.where(is_new_min, m1, jnp.minimum(m2, a1))
                    m1 = jnp.minimum(m1, a1)
                    sg_cnt = sg_cnt + (nv < 0).astype(jnp.int32)
                    new_vs.append(nv.astype(dtype))
                ok = jnp.logical_and(ok, ((par & 1) == 0).all(axis=0))
                new_min1.append(m1.astype(dtype))
                new_min2.append(m2.astype(dtype))
                new_sgn.append((sg_cnt & 1).astype(bool))

            packed = jnp.concatenate(
                [
                    ((va[c] < 0).reshape(M // 8, 8, B).astype(jnp.uint8) * _MSB_W)
                    .sum(axis=1)
                    .astype(jnp.uint8)
                    for c in range(Cc)
                ],
                axis=0,
            )
            newly_done = jnp.logical_and(ok, jnp.logical_not(done))
            bits_out = jnp.where(done[None, :], state_bits, packed)
            iters = jnp.where(newly_done, it, iters)
            done = jnp.logical_or(done, ok)
            return (
                tuple(new_vs), tuple(new_min1), tuple(new_min2), tuple(new_sgn),
                done, iters, bits_out, it + 1,
            )

        def cond_fn(state):
            *_, done, _iters, _bits, it = state
            return jnp.logical_and(it < maxiters, jnp.logical_not(done.all()))

        sumA = sum(len(row) for row in s.rows)
        z8 = tuple(jnp.zeros((M, B), dtype) for _ in range(sumA))
        zmb = tuple(jnp.zeros((M, B), dtype) for _ in range(R))
        state = (
            z8, zmb, zmb,
            tuple(jnp.zeros((M, B), bool) for _ in range(R)),
            jnp.zeros((B,), bool),
            jnp.full((B,), maxiters, jnp.int32),
            jnp.zeros((Cc * M // 8, B), jnp.uint8),
            jnp.zeros((), jnp.int32),
        )
        *_, done, iters, bits_out, _ = jax.lax.while_loop(cond_fn, body_fn, state)
        bits = unpack_bits(bits_out.T)
        return MSResult(success=done, iterations=iters, bits=bits)

    return jax.jit(decode)
