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

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..codes.expand import BlockPerm, qc_structure
from ..codes.params import LDPCCode, get_code
from .minsum import MSResult

__all__ = ["make_ms_decoder_qc", "perm_rows"]


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


def _second_min(a: jnp.ndarray):
    """(A, M, B) -> (min1, min2) over axis 0.

    min2 is the second-smallest of the multiset (ties at min1 give
    min2 == min1), matching the reference's streaming update
    (decoder.rs:429-441). Streaming over the small addend axis avoids an
    argmin tuple-reduction, which XLA lowers poorly on TPU.
    """
    big = jnp.full(a.shape[1:], float(jnp.finfo(a.dtype).max), a.dtype)
    m1 = big
    m2 = big
    for i in range(a.shape[0]):
        ai = a[i]
        is_new_min = ai < m1
        m2 = jnp.where(is_new_min, m1, jnp.minimum(m2, ai))
        m1 = jnp.minimum(m1, ai)
    return m1, m2


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
        # (Cc, M, B) node-major blocks; punctured tail = 0 (decoder.rs:382-383)
        llr_blocks = jnp.concatenate(
            [llrs.T.reshape(n_blocks, M, B), jnp.zeros((Cc - n_blocks, M, B), dtype)],
            axis=0,
        )

        def body_fn(state):
            vs, min1, min2, sgn, done, iters, state_bits, it = state
            # vs: tuple of R arrays (A_r, M, B); min1/min2/sgn: (R, M, B)-likes
            # stored as tuples of (M, B).

            # ---- sweep 1: u from min1/min2 + signs; accumulate marginals ----
            us = []
            va = [llr_blocks[c] for c in range(Cc)]
            for r in range(R):
                v = vs[r]
                mag = jnp.where(jnp.abs(v) == min1[r][None], min2[r][None], min1[r][None])
                if alpha_c is not None:
                    mag = alpha_c * mag
                neg = jnp.logical_xor(sgn[r][None], v < 0)
                u = jnp.where(neg, -mag, mag)  # (A_r, M, B)
                us.append(u)
                for a, perm in enumerate(s.rows[r]):
                    va[perm.col] = va[perm.col] + perm_rows(u[a], perm, inverse=True)

            # ---- sweep 2: self-corrected v; check stats; parity -------------
            new_vs, new_min1, new_min2, new_sgn = [], [], [], []
            ok = jnp.ones((B,), bool)
            for r in range(R):
                gathered = jnp.stack(
                    [perm_rows(va[perm.col], perm) for perm in s.rows[r]], axis=0
                )  # (A_r, M, B)
                nv = gathered - us[r]
                keep = jnp.logical_or((nv < 0) == (vs[r] < 0), vs[r] == 0)
                nv = jnp.where(keep, nv, jnp.zeros((), dtype))  # (decoder.rs:420-426)
                m1, m2 = _second_min(jnp.abs(nv))
                sg = ((nv < 0).sum(axis=0, dtype=jnp.int32) & 1).astype(bool)  # (M, B)
                par = (gathered < 0).sum(axis=0, dtype=jnp.int32) & 1
                ok = jnp.logical_and(ok, (par == 0).all(axis=0))
                new_vs.append(nv)
                new_min1.append(m1)
                new_min2.append(m2)
                new_sgn.append(sg)

            # freeze uint8 hard decisions (4x cheaper to carry than the f32
            # marginals) at each codeword's convergence iteration
            hard = (jnp.stack(va, axis=0) < 0).astype(jnp.uint8)  # (Cc, M, B)
            newly_done = jnp.logical_and(ok, jnp.logical_not(done))
            bits_out = jnp.where(done[None, None, :], state_bits, hard)
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
        state = (
            tuple(jnp.zeros((len(s.rows[r]), M, B), dtype) for r in range(R)),
            tuple(z for _ in range(R)),  # min1 = 0 (decoder.rs:374)
            tuple(z for _ in range(R)),  # min2 = 0
            tuple(jnp.zeros((M, B), bool) for _ in range(R)),
            jnp.zeros((B,), bool),
            jnp.full((B,), maxiters, jnp.int32),
            jnp.zeros((Cc, M, B), jnp.uint8),  # bits (overwritten on iter 0)
            jnp.zeros((), jnp.int32),
        )
        *_, done, iters, bits_out, _ = jax.lax.while_loop(cond_fn, body_fn, state)
        bits = bits_out.reshape(Cc * M, B).T  # (B, V) uint8
        return MSResult(success=done, iterations=iters, bits=bits)

    return jax.jit(decode)
