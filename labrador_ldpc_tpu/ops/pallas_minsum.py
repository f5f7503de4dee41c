"""Fully-fused Pallas TPU kernel for QC self-corrected min-sum decoding.

The production hot path. One `pallas_call` runs the ENTIRE iterative decode
for a batch tile with all state resident in VMEM:

  * grid = (B / Bt,): each program decodes an independent tile of Bt
    codewords laid out node-major (V, Bt) so the batch rides the 128 VPU
    lanes and all block permutations (codes/expand.py: qc_structure) are
    static sublane rolls (pltpu.roll) — no gathers, no index tables, no HBM
    traffic inside the iteration loop.
  * per-tile early termination: a `lax.while_loop` exits as soon as every
    codeword in the tile satisfies all parity checks (the batched analog of
    the reference's early return, decoder.rs:453-462), so HBM sees exactly
    one read of the LLRs and one write of the outputs per tile.
  * check->var messages are RECOMPUTED from (v, min1/min2/sign) in the
    variable sweep instead of stored, halving message memory; carried VMEM
    state is v:(sumA,M,Bt) + min1/min2:(R,M,Bt) + sign products
    (int8) + va:(Cc,M,Bt).

Algorithm semantics (update rules, self-correction, zero-init working set,
hard-decision convention, per-codeword iteration accounting) mirror the
reference `decode_ms` (decoder.rs:347-475, Savin arXiv:0803.1090) exactly;
only the floating-point accumulation order at variable nodes differs, as in
ops/qc_minsum.py. Float32/bfloat16 LLRs; `alpha` gives normalized min-sum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..codes.expand import BlockPerm, qc_structure
from ..codes.params import LDPCCode, get_code
from .minsum import MSResult

__all__ = ["make_ms_decoder_pallas"]


def _roll(x, s: int):
    """np.roll(x, s, axis=0) with a STATIC shift: out[i] = x[(i - s) % m].

    Implemented as two static slices + concat rather than pltpu.roll, which
    lowers to tpu.dynamic_rotate (unsupported for 16-bit data on v5e and
    needlessly dynamic for compile-time shifts).
    """
    m = x.shape[0]
    s %= m
    if s == 0:
        return x
    return jnp.concatenate([x[m - s :], x[: m - s]], axis=0)


def _perm(x, perm: BlockPerm, inverse: bool):
    """Static block permutation of the leading (sublane-tiled) axis via rolls.

    Forward: out[i] = x[perm(i)]; inverse: out[perm(i)] = x[i].
    """
    m = x.shape[0]
    if perm.kind == "rot":
        # forward wants out[i] = x[(i+s) % m] -> roll by -s
        return _roll(x, -perm.shift if not inverse else perm.shift)
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


def make_ms_decoder_pallas(
    code: LDPCCode | str,
    dtype=jnp.bfloat16,
    maxiters: int = 20,
    alpha: float | None = None,
    batch_tile: int = 128,
    interpret: bool = False,
):
    """Build the fused Pallas batched min-sum decoder.

    Returns fn(llrs: (B, n) dtype) -> MSResult; B must be a multiple of
    `batch_tile`. Positive LLRs favor bit 0.
    """
    code = get_code(code)
    p = code.params
    dtype = jnp.dtype(dtype)
    if dtype not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        raise ValueError("pallas decoder supports float32/bfloat16 LLRs")
    s = qc_structure(code)
    M, R, Cc = s.m, s.n_block_rows, s.n_block_cols
    n, V = p.n, p.n_vars
    n_blocks = n // M
    Bt = batch_tile
    sumA = sum(len(r) for r in s.rows)
    row_off = np.cumsum([0] + [len(r) for r in s.rows]).tolist()

    # All vector arithmetic/comparisons run in float32 (v5e Mosaic has no
    # bf16 vector compares); bf16 is a STORAGE format only. Monotonicity of
    # rounding + computing stats from the rounded messages keeps the
    # min1/min2/equality logic exactly self-consistent in bf16 mode.
    cdt = jnp.float32
    f32 = lambda x: x.astype(cdt)
    alpha_f = None if alpha is None else jnp.array(alpha, dtype=cdt)

    def _u_from(v, m1, m2, sgn):
        """Recompute check->var message u for one addend (f32 values).

        v: (M, Bt) old message; m1/m2: (M, Bt) row min1/min2; sgn: (M, Bt)
        row sign product (1.0 = odd number of negatives).
        """
        mag = jnp.where(jnp.abs(v) == m1, m2, m1)
        if alpha_f is not None:
            mag = alpha_f * mag
        neg = jnp.logical_xor(sgn != jnp.zeros((), cdt), v < 0)
        return jnp.where(neg, -mag, mag)

    def kernel(llr_ref, bits_ref, done_ref, iters_ref, v_ref, m1_ref, m2_ref, sgn_ref, va_ref):
        # llr_ref: (V, Bt) in; bits_ref: (V, Bt) int8 out; done_ref: (1, Bt)
        # int32 out; iters_ref: (1, Bt) int32 out.
        # scratch: v (sumA*M, Bt), m1/m2/sgn (R*M, Bt) in `dtype`;
        # va (Cc*M, Bt) in f32 (accumulator precision).
        zero = jnp.zeros((), cdt)

        v_ref[:] = jnp.zeros((sumA * M, Bt), dtype)
        m1_ref[:] = jnp.zeros((R * M, Bt), dtype)  # zeroed working set (decoder.rs:374)
        m2_ref[:] = jnp.zeros((R * M, Bt), dtype)
        sgn_ref[:] = jnp.zeros((R * M, Bt), dtype)
        done_ref[:] = jnp.zeros((1, Bt), jnp.int32)
        iters_ref[:] = jnp.full((1, Bt), maxiters, jnp.int32)
        bits_ref[:] = jnp.zeros((V, Bt), jnp.int8)

        def body(carry):
            it, _all_done = carry

            # ---- variable sweep: marginals from recomputed u ---------------
            # includes zeroed punctured tail (decoder.rs:382-383)
            va_ref[:] = f32(llr_ref[:])
            for r in range(R):
                m1 = f32(m1_ref[r * M : (r + 1) * M])
                m2 = f32(m2_ref[r * M : (r + 1) * M])
                sgn = f32(sgn_ref[r * M : (r + 1) * M])
                for a, perm in enumerate(s.rows[r]):
                    e = row_off[r] + a
                    v_old = f32(v_ref[e * M : (e + 1) * M])
                    u = _u_from(v_old, m1, m2, sgn)
                    cs = perm.col * M
                    va_ref[cs : cs + M] = va_ref[cs : cs + M] + _perm(u, perm, inverse=True)

            # ---- check sweep: self-corrected v, new stats, parity ----------
            bad = jnp.zeros((1, Bt), jnp.int32)
            for r in range(R):
                m1 = f32(m1_ref[r * M : (r + 1) * M])
                m2 = f32(m2_ref[r * M : (r + 1) * M])
                sgn = f32(sgn_ref[r * M : (r + 1) * M])
                new_vs = []
                par = jnp.zeros((M, Bt), jnp.int32)
                for a, perm in enumerate(s.rows[r]):
                    e = row_off[r] + a
                    v_old = f32(v_ref[e * M : (e + 1) * M])
                    u = _u_from(v_old, m1, m2, sgn)
                    g = _perm(va_ref[perm.col * M : (perm.col + 1) * M], perm, inverse=False)
                    # round to storage dtype BEFORE sign/stat decisions so the
                    # stored state is exactly what the stats describe
                    nv = f32((g - u).astype(dtype))
                    keep = jnp.logical_or((nv < 0) == (v_old < 0), v_old == zero)
                    nv = jnp.where(keep, nv, zero)  # self-correction (decoder.rs:420-426)
                    par = par + (g < 0).astype(jnp.int32)
                    new_vs.append(nv)
                # two smallest |nv| over the row's addends + sign product
                big = jnp.full((M, Bt), jnp.array(jnp.finfo(dtype).max, cdt))
                m1n = big
                m2n = big
                sg = jnp.zeros((M, Bt), jnp.int32)
                for nv in new_vs:
                    a1 = jnp.abs(nv)
                    is_new_min = a1 < m1n
                    m2n = jnp.where(is_new_min, m1n, jnp.minimum(m2n, a1))
                    m1n = jnp.minimum(m1n, a1)
                    sg = sg + (nv < 0).astype(jnp.int32)
                for a, nv in enumerate(new_vs):
                    e = row_off[r] + a
                    v_ref[e * M : (e + 1) * M] = nv.astype(dtype)
                m1_ref[r * M : (r + 1) * M] = m1n.astype(dtype)
                m2_ref[r * M : (r + 1) * M] = m2n.astype(dtype)
                sgn_ref[r * M : (r + 1) * M] = (sg & 1).astype(dtype)
                bad = bad + jnp.sum((par & 1), axis=0, keepdims=True)

            ok = (bad == 0).astype(jnp.int32)  # (1, Bt)
            done = done_ref[:]
            newly = jnp.logical_and(ok == 1, done == 0)
            iters_ref[:] = jnp.where(newly, it, iters_ref[:])
            # freeze outputs at each codeword's convergence iteration
            live = (done == 0)[0]  # (Bt,)
            hard = (va_ref[:] < 0).astype(jnp.int8)
            bits_ref[:] = jnp.where(live[None, :], hard, bits_ref[:])
            done_ref[:] = jnp.maximum(done, ok)
            return it + 1, jnp.min(done_ref[:]) == 1

        def cond(carry):
            it, all_done = carry
            return jnp.logical_and(it < maxiters, jnp.logical_not(all_done))

        jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32), jnp.zeros((), bool)))

    def build_call(B):
        tiles = B // Bt
        return pl.pallas_call(
            kernel,
            grid=(tiles,),
            in_specs=[
                pl.BlockSpec((V, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((V, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((V, B), jnp.int8),
                jax.ShapeDtypeStruct((1, B), jnp.int32),
                jax.ShapeDtypeStruct((1, B), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.VMEM((sumA * M, Bt), dtype),
                pltpu.VMEM((R * M, Bt), dtype),
                pltpu.VMEM((R * M, Bt), dtype),
                pltpu.VMEM((R * M, Bt), dtype),
                pltpu.VMEM((Cc * M, Bt), jnp.float32),
            ],
            interpret=interpret,
        )

    @jax.jit
    def decode(llrs: jnp.ndarray) -> MSResult:
        llrs = jnp.asarray(llrs, dtype=dtype)
        assert llrs.ndim == 2 and llrs.shape[1] == n, f"llrs must be (B, {n})"
        B = llrs.shape[0]
        assert B % Bt == 0, f"batch must be a multiple of {Bt}"
        llr_t = jnp.concatenate(
            [llrs.T, jnp.zeros((V - n, B), dtype)], axis=0
        )  # (V, B), punctured tail zeroed
        bits_t, done, iters = build_call(B)(llr_t)
        return MSResult(
            success=done[0].astype(bool),
            iterations=iters[0],
            bits=bits_t.T.astype(jnp.uint8),
        )

    return decode
