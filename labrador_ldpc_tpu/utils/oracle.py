"""Slow NumPy oracle codec: a faithful semantic re-implementation of the
reference decoders, used ONLY as a differential-test oracle and to regenerate
BER baselines at small scale.

This is intentionally scalar/loopy: it follows the reference's algorithms
step by step (same edge order, same saturating arithmetic, same
self-correction rule) so the batched TPU decoders can be tested for
bit-exact agreement against it.

Semantics ported from:
  * min-sum:   src/decoder.rs:347-475 (self-corrected min-sum, Savin 2008)
  * bit-flip:  src/decoder.rs:243-301
  * erasures:  src/decoder.rs:144-223 (incl. the bits_fixed accounting quirk:
               it accumulates the still-erased count across iterations, so it
               reaches p at the end of iteration 0 and the function always
               returns (True, 0) when maxiters > 0 — see SURVEY.md §2 row 9)
  * hard/LLR:  src/decoder.rs:484-509
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..codes.expand import generator_parity_matrix, parity_edges
from ..codes.params import LDPCCode, get_code

# ---------------------------------------------------------------------------
# dtype policies mirroring the reference's DecodeFrom impls (decoder.rs:42-86)


class _F32Ops:
    dtype = np.float32
    maxval = np.float32(np.finfo(np.float32).max)

    @staticmethod
    def abs(x):
        return np.float32(abs(float(x)))

    @staticmethod
    def add(a, b):
        return np.float32(np.float32(a) + np.float32(b))

    @staticmethod
    def sub(a, b):
        return np.float32(np.float32(a) - np.float32(b))

    @staticmethod
    def hard(x) -> bool:
        return float(x) < 0.0


class _I8Ops:
    dtype = np.int8
    maxval = np.int8(127)

    @staticmethod
    def abs(x):
        x = int(x)
        return np.int8(min(abs(x), 127))  # saturating_abs: |-128| -> 127

    @staticmethod
    def add(a, b):
        return np.int8(max(-128, min(127, int(a) + int(b))))

    @staticmethod
    def sub(a, b):
        return np.int8(max(-128, min(127, int(a) - int(b))))

    @staticmethod
    def hard(x) -> bool:
        return int(x) < 0


class _I16Ops(_I8Ops):
    dtype = np.int16
    maxval = np.int16(32767)

    @staticmethod
    def abs(x):
        return np.int16(min(abs(int(x)), 32767))

    @staticmethod
    def add(a, b):
        return np.int16(max(-32768, min(32767, int(a) + int(b))))

    @staticmethod
    def sub(a, b):
        return np.int16(max(-32768, min(32767, int(a) - int(b))))


class _F64Ops(_F32Ops):
    dtype = np.float64
    maxval = np.float64(np.finfo(np.float64).max)

    @staticmethod
    def abs(x):
        return np.float64(abs(float(x)))

    @staticmethod
    def add(a, b):
        return np.float64(float(a) + float(b))

    @staticmethod
    def sub(a, b):
        return np.float64(float(a) - float(b))


class _I32Ops(_I8Ops):
    dtype = np.int32
    maxval = np.int32(2**31 - 1)

    @staticmethod
    def abs(x):
        return np.int32(min(abs(int(x)), 2**31 - 1))

    @staticmethod
    def add(a, b):
        return np.int32(max(-(2**31), min(2**31 - 1, int(a) + int(b))))

    @staticmethod
    def sub(a, b):
        return np.int32(max(-(2**31), min(2**31 - 1, int(a) - int(b))))


_OPS = {}
for _ops in (_F32Ops, _F64Ops, _I8Ops, _I16Ops, _I32Ops):
    _OPS[_ops.dtype] = _ops
    _OPS[np.dtype(_ops.dtype)] = _ops


# ---------------------------------------------------------------------------
# bit packing helpers (MSB-first, as the reference's byte conventions)


def pack_bits(bits: np.ndarray) -> np.ndarray:
    return np.packbits(np.asarray(bits, dtype=np.uint8))


def unpack_bits(data: np.ndarray, nbits: int | None = None) -> np.ndarray:
    bits = np.unpackbits(np.asarray(data, dtype=np.uint8))
    return bits if nbits is None else bits[:nbits]


# ---------------------------------------------------------------------------
# encode (dense matmul against the expanded generator; validated against the
# reference's golden parity vectors in tests)


def encode(code: LDPCCode | str, data_bytes: np.ndarray) -> np.ndarray:
    """Systematic encode: k/8 data bytes -> n/8 codeword bytes."""
    code = get_code(code)
    p = code.params
    data_bytes = np.asarray(data_bytes, dtype=np.uint8)
    assert data_bytes.size == p.k // 8
    dbits = unpack_bits(data_bytes)
    parity = (dbits @ generator_parity_matrix(code)) & 1
    return np.concatenate([data_bytes, pack_bits(parity)])


def hard_to_llrs(code: LDPCCode | str, input_bytes: np.ndarray, dtype=np.float32) -> np.ndarray:
    """bit 1 -> -1, bit 0 -> +1 (decoder.rs:484-493)."""
    code = get_code(code)
    bits = unpack_bits(input_bytes, code.n)
    return np.where(bits == 1, -1, 1).astype(dtype)


def llrs_to_hard(code: LDPCCode | str, llrs: np.ndarray) -> np.ndarray:
    """sign -> packed bits MSB-first (decoder.rs:498-509)."""
    return pack_bits((np.asarray(llrs) < 0).astype(np.uint8))


# ---------------------------------------------------------------------------
# min-sum decoder (decoder.rs:347-475)


def decode_ms(code: LDPCCode | str, llrs: np.ndarray, maxiters: int = 20):
    """Self-corrected min-sum decode of one codeword.

    Returns (success, iters, output_bytes) with output (n+p)/8 bytes,
    matching the reference's return convention (iters is the 0-based
    iteration index at convergence, or maxiters on failure).
    """
    code = get_code(code)
    ops = _OPS[np.asarray(llrs).dtype]
    p = code.params
    n, k, pb = p.n, p.k, p.punctured_bits
    E, Cn, Vn = p.paritycheck_sum, p.n_checks, p.n_vars
    edges = parity_edges(code)
    llrs = np.asarray(llrs, dtype=ops.dtype)
    assert llrs.size == n

    u = np.zeros(E, dtype=ops.dtype)
    v = np.zeros(E, dtype=ops.dtype)
    va = np.zeros(Vn, dtype=ops.dtype)
    ui_min1 = np.zeros(Cn, dtype=ops.dtype)
    ui_min2 = np.zeros(Cn, dtype=ops.dtype)
    ui_sgns = np.zeros(Cn, dtype=bool)
    parities = np.zeros(Cn, dtype=bool)

    def hard_output():
        return pack_bits((_hard_vec(va, ops)).astype(np.uint8))

    for it in range(maxiters):
        va[:n] = llrs
        va[n:] = 0
        # sweep 1: u from (min1|min2, signs); accumulate marginals
        for idx in range(E):
            chk, var = edges[idx]
            if ops.abs(v[idx]) == ui_min1[chk]:
                u[idx] = ui_min2[chk]
            else:
                u[idx] = ui_min1[chk]
            if ui_sgns[chk]:
                u[idx] = -u[idx]
            if ops.hard(v[idx]):
                u[idx] = -u[idx]
            va[var] = ops.add(va[var], u[idx])
        # sweep 2: v with self-correction; min1/min2/sgns; parity of va
        ui_min1[:] = ops.maxval
        ui_min2[:] = ops.maxval
        ui_sgns[:] = False
        parities[:] = False
        for idx in range(E):
            chk, var = edges[idx]
            new_v = ops.sub(va[var], u[idx])
            if ops.hard(new_v) == ops.hard(v[idx]) or v[idx] == 0:
                v[idx] = new_v
            else:
                v[idx] = 0
            av = ops.abs(v[idx])
            if av < ui_min1[chk]:
                ui_min2[chk] = ui_min1[chk]
                ui_min1[chk] = av
            elif av < ui_min2[chk]:
                ui_min2[chk] = av
            if ops.hard(v[idx]):
                ui_sgns[chk] = not ui_sgns[chk]
            if ops.hard(va[var]):
                parities[chk] = not parities[chk]
        if not parities.any():
            return True, it, hard_output()
    return False, maxiters, hard_output()


def _hard_vec(x: np.ndarray, ops) -> np.ndarray:
    return np.array([ops.hard(xi) for xi in x], dtype=bool)


# ---------------------------------------------------------------------------
# independent executor for the WIDE-ACCUMULATOR layered int semantics
# (VERDICT r4 item 7). This repo's best int8 result — the layered schedule
# with saturating MESSAGES but a wide (never-clipped) posterior accumulator
# (ops/qc_minsum.make_ms_decoder_layered docstring) — is a deliberate
# redesign with no counterpart in the reference, so the native C++ codec
# (reference flooding semantics) cannot cross-check it. This NumPy
# implementation executes the same documented algorithm from scratch over
# plain CSR edge tables — no QC roll formulation, no block permutations,
# no code shared with the jax/Pallas twins — closing the last
# single-executor loop in the BER chain. tests/test_decoders.py pins it
# bit-exact (bits/success/iterations) against make_ms_decoder_layered on
# small codes; tools/native_crosscheck.py drives it through the channel
# protocol at the TM8192 int8 anchor for the statistical gate.


@lru_cache(maxsize=None)
def _layer_tables(name: str):
    """Per-block-row CSR edge tables: for layer r (checks [rM, (r+1)M)),
    (vars, seg_starts, edge_seg) with edges sorted by check. Plus the flat
    (check, var) arrays for the end-of-iteration syndrome. numpy only
    (never cache jnp arrays — CLAUDE.md)."""
    code = get_code(name)
    p = code.params
    M = code.submatrix_size
    R = p.n_checks // M
    edges = np.asarray(parity_edges(code), dtype=np.int64).reshape(-1, 2)
    chk, var = edges[:, 0], edges[:, 1]
    layers = []
    for r in range(R):
        sel = (chk >= r * M) & (chk < (r + 1) * M)
        c_r, v_r = chk[sel], var[sel]
        order = np.argsort(c_r, kind="stable")
        c_r, v_r = c_r[order], v_r[order]
        uniq, starts = np.unique(c_r, return_index=True)
        assert len(uniq) == M, (name, r)  # every check has edges
        layers.append((v_r, starts, c_r - r * M))
    return layers, chk, var


def decode_ms_layered_int(code: LDPCCode | str, llrs: np.ndarray, maxiters: int = 20):
    """Row-layered self-corrected min-sum with saturating int8/int16
    messages and a WIDE posterior accumulator — the independent executor
    of the production layered-int semantics.

    The algorithm, restated from the twin's documented contract
    (qc_minsum.make_ms_decoder_layered): per iteration, block-rows of H
    are processed sequentially; for layer r, extrinsics
    t = clip(va - u_old) (saturating sub) are computed for ALL of the
    layer's edges from the layer-entry posteriors, self-corrected against
    the previous iteration's extrinsic of the same edge (zero on sign
    flip, decoder.rs:420-426), reduced per check to the two smallest
    saturating |t| and the sign product, and the posterior is updated
    va += u_new - u_old with NO clipping (the accumulator is bounded by
    (1 + var degree) * HI, exact in int64). Convergence is the syndrome
    over the end-of-iteration posterior signs.

    Returns (success, iters, output_bytes) like `decode_ms` (iters is the
    0-based iteration index at convergence, maxiters on failure).
    """
    code = get_code(code)
    p = code.params
    llrs = np.asarray(llrs)
    dt = llrs.dtype
    assert dt in (np.dtype(np.int8), np.dtype(np.int16)), dt
    LO, HI = int(np.iinfo(dt).min), int(np.iinfo(dt).max)
    n, Vn = p.n, p.n_vars
    assert llrs.size == n
    layers, chk_all, var_all = _layer_tables(code.name)

    va = np.zeros(Vn, np.int64)
    va[:n] = llrs.astype(np.int64)
    u = [np.zeros(len(v_r), np.int64) for (v_r, _, _) in layers]
    tp = [np.zeros(len(v_r), np.int64) for (v_r, _, _) in layers]

    for it in range(maxiters):
        for li, (v_r, starts, seg) in enumerate(layers):
            t = np.clip(va[v_r] - u[li], LO, HI)
            keep = ((t < 0) == (tp[li] < 0)) | (tp[li] == 0)
            t = np.where(keep, t, 0)
            a1 = np.minimum(np.abs(t), HI)  # saturating abs: |-128| -> 127
            m1 = np.minimum.reduceat(a1, starts)
            at_min = a1 == m1[seg]
            cnt_min = np.add.reduceat(at_min.astype(np.int64), starts)
            # second-smallest with the twin's HI seed semantics: when the
            # min is unique, min over the remaining edges (HI if none)
            excl = np.where(at_min, np.int64(HI), a1)
            m2 = np.where(cnt_min >= 2, m1, np.minimum.reduceat(excl, starts))
            neg_t = t < 0
            sg = (np.add.reduceat(neg_t.astype(np.int64), starts) & 1).astype(bool)
            mag = np.where(at_min, m2[seg], m1[seg])
            u_new = np.where(sg[seg] ^ neg_t, -mag, mag)
            np.add.at(va, v_r, u_new - u[li])  # wide accumulator: no clip
            u[li] = u_new
            tp[li] = t
        par = np.zeros(p.n_checks, np.int64)
        np.add.at(par, chk_all, (va[var_all] < 0).astype(np.int64))
        if not (par & 1).any():
            return True, it, pack_bits((va < 0).astype(np.uint8))
    return False, maxiters, pack_bits((va < 0).astype(np.uint8))


# ---------------------------------------------------------------------------
# erasure decoder (decoder.rs:144-223)


def decode_erasures(code: LDPCCode | str, codeword_bytes: np.ndarray, maxiters: int = 20):
    """Fix punctured (never-transmitted) bits of a hard codeword.

    `codeword_bytes` must be (n+p)/8 long with the first n/8 bytes set;
    returns (success, iters, fixed_codeword_bytes).
    """
    code = get_code(code)
    p = code.params
    n, pb, Vn = p.n, p.punctured_bits, p.n_vars
    edges = parity_edges(code)
    bits = unpack_bits(codeword_bytes, Vn).astype(np.uint8)
    bits[n:] = 0
    erased = np.zeros(Vn, dtype=bool)
    erased[n:] = True

    bits_fixed = 0
    for it in range(maxiters):
        # per-check: parity over non-erased vars; erasure count saturating at 2
        parity = np.zeros(p.n_checks, dtype=np.uint8)
        ecount = np.zeros(p.n_checks, dtype=np.int64)
        for chk, var in edges:
            if erased[var]:
                ecount[chk] = min(ecount[chk] + 1, 2)
            elif bits[var]:
                parity[chk] ^= 1
        # single-erasure checks vote +-1 on their erased var
        votes = np.zeros(Vn, dtype=np.int64)
        for chk, var in edges:
            if erased[var] and ecount[chk] == 1:
                votes[var] += 1 if parity[chk] else -1
        # fix majority-1 vars; count every still-erased var (reference quirk)
        for var in range(n, Vn):
            if erased[var]:
                if votes[var] > 0:
                    bits[var] = 1
                    erased[var] = False
                bits_fixed += 1
        if bits_fixed == pb:
            return True, it, pack_bits(bits)
    return False, maxiters, pack_bits(bits)


# ---------------------------------------------------------------------------
# bit-flipping decoder (decoder.rs:243-301)


def decode_bf(code: LDPCCode | str, input_bytes: np.ndarray, maxiters: int = 20):
    """Hard-decision bit-flip decode. Returns (success, iters, output_bytes)."""
    code = get_code(code)
    p = code.params
    n, Vn = p.n, p.n_vars
    edges = parity_edges(code)

    out = np.zeros(p.output_len, dtype=np.uint8)
    out[: n // 8] = np.asarray(input_bytes, dtype=np.uint8)
    erasure_iters = 0
    if p.punctured_bits > 0:
        _, erasure_iters, fixed = decode_erasures(code, out, maxiters)
        out = fixed.copy()

    bits = unpack_bits(out, Vn).astype(np.uint8)
    for it in range(maxiters):
        parity = np.zeros(p.n_checks, dtype=np.uint8)
        for chk, var in edges:
            parity[chk] ^= bits[var]
        violations = np.zeros(Vn, dtype=np.int64)
        for chk, var in edges:
            if parity[chk]:
                violations[var] += 1
        mx = violations.max()
        if mx == 0:
            return True, it + erasure_iters, pack_bits(bits)
        bits ^= (violations == mx).astype(np.uint8)
    return False, maxiters + erasure_iters, pack_bits(bits)
