"""Fully-fused Pallas TPU kernel for QC self-corrected min-sum decoding.

STATUS: experimental, NOT the production path. Measured on v5e, the XLA
formulation of the same algorithm (ops/qc_minsum.py) is currently much
faster (e.g. TC128: 230k cw/s XLA vs 4.8k cw/s fused kernel) and the fused
kernel exceeds Mosaic's scoped-VMEM stack for the large TM codes; XLA's
fusion + pipelining already handles this roll/elementwise workload well.
The kernel is kept as a validated-correct (tests/test_pallas.py) base for
future kernel-level optimization; use impl="qc" for production decoding.

One `pallas_call` runs the ENTIRE iterative decode for a batch tile with
all state resident in VMEM:

  * grid = (B / Bt,): each program decodes an independent tile of Bt
    codewords laid out node-major (V, Bt) so the batch rides the 128 VPU
    lanes and all block permutations (codes/expand.py: qc_structure) are
    static sublane slice+concat rolls — no gathers, no index tables, no HBM
    traffic inside the iteration loop.
  * fully MANUAL I/O (memory_space=ANY -> HBM): the kernel DMAs the LLR
    tile into VMEM once, runs the whole decode loop DMA-free, and DMAs the
    frozen outputs back at the end. Only single-buffered scratch occupies
    VMEM — Pallas's automatic pipelining would double-buffer full
    input/output blocks and blow the 16 MB scoped budget on the big TM
    codes (and Mosaic mishandles HBM DMAs inside while_loops).
  * per-tile early termination: a `lax.while_loop` exits as soon as every
    codeword in the tile satisfies all parity checks (the batched analog of
    the reference's early return, decoder.rs:453-462).
  * minimal carried state: only the edge messages v:(sumA*M, Bt) and the
    marginal scratch va:(Cc*M, Bt). The per-check min1/min2/sign-product
    statistics are pure functions of v and are recomputed per prototype row
    in both sweeps, and the check->var messages u are likewise recomputed
    rather than stored. All passes stream ONE addend block at a time from
    VMEM (re-loading instead of retaining): Mosaic statically allocates
    stack for the peak live vector set, so holding a whole row of f32
    message upcasts would cost more scoped VMEM than the scratch itself.

Mosaic-on-v5e constraints shape the implementation: no int8/bf16 vector
compares and no 16-bit dynamic rotate, so ALL arithmetic/comparison runs in
float32 (storage dtype is bf16 or f32; rounding is monotone, and all
decisions are made on the rounded stored values, keeping min/equality logic
exactly self-consistent), and rolls are static slice+concat.

Algorithm semantics (update rules, self-correction, zero-initialized
working set, hard-decision convention, per-codeword iteration accounting)
mirror the reference `decode_ms` (decoder.rs:347-475, Savin
arXiv:0803.1090); only the floating-point accumulation order at variable
nodes differs, as in ops/qc_minsum.py (validated: identical decoded outputs
on converged codewords, tests/test_pallas.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..codes.expand import BlockPerm, qc_structure
from ..codes.params import LDPCCode, get_code
from .minsum import MSResult

__all__ = ["make_ms_decoder_pallas", "default_batch_tile"]


def _roll(x, s: int):
    """np.roll(x, s, axis=0) with a STATIC shift: out[i] = x[(i - s) % m].

    Two static slices + concat rather than pltpu.roll, which lowers to
    tpu.dynamic_rotate (unsupported for 16-bit data on v5e and needlessly
    dynamic for compile-time shifts).
    """
    m = x.shape[0]
    s %= m
    if s == 0:
        return x
    return jnp.concatenate([x[m - s :], x[: m - s]], axis=0)


def _perm(x, perm: BlockPerm, inverse: bool):
    """Static block permutation of the leading (sublane) axis via rolls.

    Forward: out[i] = x[perm(i)]; inverse: out[perm(i)] = x[i].
    HP's quarter decomposition: quarter j of the check-side view is var
    quarter (theta+j)%4 rolled by phi_j (compact_parity_checks.rs:107-108).
    """
    m = x.shape[0]
    if perm.kind == "rot":
        return _roll(x, perm.shift if inverse else -perm.shift)
    q = m // 4
    parts = []
    for t in range(4):  # output quarter
        if inverse:
            j = (t - perm.theta) % 4
            parts.append(_roll(x[j * q : (j + 1) * q], perm.phis[j]))
        else:
            s = (perm.theta + t) % 4
            parts.append(_roll(x[s * q : (s + 1) * q], -perm.phis[t]))
    return jnp.concatenate(parts, axis=0)


def default_batch_tile(code: LDPCCode | str, dtype=jnp.bfloat16) -> int:
    """Largest lane-aligned tile that fits the ~16 MB VMEM budget."""
    code = get_code(code)
    s = qc_structure(code)
    p = code.params
    itemsize = jnp.dtype(dtype).itemsize
    sumA = sum(len(r) for r in s.rows)
    # VMEM per lane: v + va + llr tile (dtype) + local bits (s8)
    per_lane = (sumA * s.m + 2 * p.n_vars) * itemsize + p.n_vars
    budget = int(14.5 * 1024 * 1024)  # slack under the 16 MB scoped limit
    bt = budget // per_lane
    return int(max(64, min(512, (bt // 64) * 64)))


def make_ms_decoder_pallas(
    code: LDPCCode | str,
    dtype=jnp.bfloat16,
    maxiters: int = 20,
    alpha: float | None = None,
    batch_tile: int | None = None,
    interpret: bool = False,
):
    """Build the fused Pallas batched min-sum decoder.

    Returns fn(llrs: (B, n) dtype) -> MSResult; B must be a multiple of the
    batch tile (default: largest fitting VMEM). Positive LLRs favor bit 0.
    `alpha` scales check magnitudes (normalized min-sum); None reproduces
    the reference's plain self-corrected min-sum.
    """
    code = get_code(code)
    p = code.params
    dtype = jnp.dtype(dtype)
    if dtype not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        raise ValueError("pallas decoder supports float32/bfloat16 LLRs")
    s = qc_structure(code)
    M, R, Cc = s.m, s.n_block_rows, s.n_block_cols
    n, V = p.n, p.n_vars
    Bt = batch_tile or default_batch_tile(code, dtype)
    sumA = sum(len(r) for r in s.rows)
    row_off = np.cumsum([0] + [len(r) for r in s.rows]).tolist()

    cdt = jnp.float32  # compute dtype (v5e Mosaic: no bf16 vector compares)
    f32 = lambda x: x.astype(cdt)
    alpha_f = None if alpha is None else float(alpha)
    big = float(jnp.finfo(dtype).max)

    def _row_stats(v_rows):
        """List of (M, Bt) f32 messages -> (min1, min2, sign-product).

        min2 is the second-smallest of the multiset (ties at min1 give
        min2 == min1), matching the reference's streaming update
        (decoder.rs:429-441).
        """
        m1 = jnp.full(v_rows[0].shape, big, cdt)
        m2 = m1
        sg = jnp.zeros(v_rows[0].shape, jnp.int32)
        for v in v_rows:
            a1 = jnp.abs(v)
            is_new_min = a1 < m1
            m2 = jnp.where(is_new_min, m1, jnp.minimum(m2, a1))
            m1 = jnp.minimum(m1, a1)
            sg = sg + (v < 0).astype(jnp.int32)
        return m1, m2, (sg & 1) == 1

    def _u_from(v, m1, m2, sgn):
        """check->var message for one addend (f32): +-(min1|min2) with the
        extrinsic sign (decoder.rs:388-405)."""
        mag = jnp.where(jnp.abs(v) == m1, m2, m1)
        if alpha_f is not None:
            mag = alpha_f * mag
        neg = jnp.logical_xor(sgn, v < 0)
        return jnp.where(neg, -mag, mag)

    def kernel(
        llr_hbm, bits_hbm, done_hbm, iters_hbm, v_ref, va_ref, llr_l, bits_l, flags_l, sems
    ):
        # llr_hbm: (V, B) dtype in HBM (punctured tail pre-zeroed);
        # bits_hbm: (V, B) int8 out; done_hbm/iters_hbm: (8, B) int32 out
        # (8 sublanes for int32 tiling; row 0 is the payload).
        # VMEM scratch: v (sumA*M, Bt), va + llr tile (Cc*M, Bt), bits_l
        # (V, Bt) s8, flags_l (16, Bt) s32 (row 0 = done, row 8 = iters).
        zero = jnp.zeros((), cdt)
        tile = pl.program_id(0)

        cp = pltpu.make_async_copy(llr_hbm.at[:, pl.ds(tile * Bt, Bt)], llr_l, sems.at[0])
        cp.start()
        cp.wait()

        for e in range(sumA):  # zeroed working set (decoder.rs:374), block-wise
            v_ref[e * M : (e + 1) * M] = jnp.zeros((M, Bt), dtype)
        flags_l[0:8] = jnp.zeros((8, Bt), jnp.int32)  # done
        flags_l[8:16] = jnp.full((8, Bt), maxiters, jnp.int32)  # iters
        for c in range(Cc):
            bits_l[c * M : (c + 1) * M] = jnp.zeros((M, Bt), jnp.int8)

        def load_v(r, a):
            e = row_off[r] + a
            return f32(v_ref[e * M : (e + 1) * M])

        def row_stats(r):
            # stream addends one at a time: Mosaic sizes its stack for the
            # PEAK live set, so retaining all A_r f32 upcasts is unaffordable
            return _row_stats([load_v(r, a) for a in range(len(s.rows[r]))])

        def body(carry):
            it, _all_done = carry

            # ---- variable sweep: va = llr + sum of u (decoder.rs:388-411)
            va_ref[:] = llr_l[:]
            for r in range(R):
                m1, m2, sgn = row_stats(r)
                for a, perm in enumerate(s.rows[r]):
                    u = _u_from(load_v(r, a), m1, m2, sgn)
                    cs = perm.col * M
                    va_ref[cs : cs + M] = (
                        f32(va_ref[cs : cs + M]) + _perm(u, perm, inverse=True)
                    ).astype(dtype)

            # ---- check sweep: self-corrected v + parity (decoder.rs:419-450)
            bad = jnp.zeros((1, Bt), jnp.int32)
            for r in range(R):
                m1, m2, sgn = row_stats(r)
                par = jnp.zeros((M, Bt), jnp.int32)
                for a, perm in enumerate(s.rows[r]):
                    v_old = load_v(r, a)
                    u = _u_from(v_old, m1, m2, sgn)
                    g = _perm(f32(va_ref[perm.col * M : (perm.col + 1) * M]), perm, False)
                    # round BEFORE the sign/keep decisions so stored state is
                    # exactly what the next iteration's stats describe
                    nv = f32((g - u).astype(dtype))
                    keep = jnp.logical_or((nv < 0) == (v_old < 0), v_old == zero)
                    nv = jnp.where(keep, nv, zero)  # self-correction (decoder.rs:420-426)
                    par = par + (g < 0).astype(jnp.int32)
                    e = row_off[r] + a
                    v_ref[e * M : (e + 1) * M] = nv.astype(dtype)
                bad = bad + jnp.sum(par & 1, axis=0, keepdims=True)

            ok = (bad == 0).astype(jnp.int32)  # (1, Bt)
            done = flags_l[0:1]
            newly = jnp.logical_and(ok == 1, done == 0)
            flags_l[8:9] = jnp.where(newly, it, flags_l[8:9])
            # freeze outputs at each codeword's convergence iteration,
            # block-wise to bound the live temporaries
            live = (done == 0)[0]  # (Bt,)
            for c in range(Cc):
                cs = c * M
                hard = (f32(va_ref[cs : cs + M]) < 0).astype(jnp.int8)
                bits_l[cs : cs + M] = jnp.where(live[None, :], hard, bits_l[cs : cs + M])
            flags_l[0:1] = jnp.maximum(done, ok)
            return it + 1, jnp.min(flags_l[0:1]) == 1

        def cond(carry):
            it, all_done = carry
            return jnp.logical_and(it < maxiters, jnp.logical_not(all_done))

        jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32), jnp.zeros((), bool)))

        # ---- write back the tile's outputs -------------------------------
        cps = [
            pltpu.make_async_copy(bits_l, bits_hbm.at[:, pl.ds(tile * Bt, Bt)], sems.at[0]),
            pltpu.make_async_copy(
                flags_l.at[0:8], done_hbm.at[:, pl.ds(tile * Bt, Bt)], sems.at[1]
            ),
            pltpu.make_async_copy(
                flags_l.at[8:16], iters_hbm.at[:, pl.ds(tile * Bt, Bt)], sems.at[2]
            ),
        ]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

    def build_call(B):
        return pl.pallas_call(
            kernel,
            grid=(B // Bt,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((V, B), jnp.int8),
                jax.ShapeDtypeStruct((8, B), jnp.int32),
                jax.ShapeDtypeStruct((8, B), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.VMEM((sumA * M, Bt), dtype),
                pltpu.VMEM((Cc * M, Bt), dtype),
                pltpu.VMEM((Cc * M, Bt), dtype),
                pltpu.VMEM((V, Bt), jnp.int8),
                pltpu.VMEM((16, Bt), jnp.int32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
            interpret=interpret,
        )

    # The pallas_call runs as its OWN executable: embedding it in a jit
    # alongside the pad/transpose pre/post ops makes XLA place the ANY
    # operand and outputs in scoped VMEM (OOM on the big TM codes), so the
    # three stages dispatch separately.
    @jax.jit
    def _prep(llrs):
        # (B, n) -> (V, B) node-major, punctured tail zeroed (decoder.rs:382-383)
        B = llrs.shape[0]
        return jnp.concatenate([llrs.T, jnp.zeros((V - n, B), dtype)], axis=0)

    @jax.jit
    def _post(bits_t, done, iters):
        return MSResult(
            success=done[0].astype(bool),
            iterations=iters[0],
            bits=bits_t.T.astype(jnp.uint8),
        )

    def decode(llrs: jnp.ndarray) -> MSResult:
        llrs = jnp.asarray(llrs, dtype=dtype)
        assert llrs.ndim == 2 and llrs.shape[1] == n, f"llrs must be (B, {n})"
        B = llrs.shape[0]
        assert B % Bt == 0, f"batch must be a multiple of {Bt}"
        bits_t, done, iters = build_call(B)(_prep(llrs))
        return _post(bits_t, done, iters)

    return decode
