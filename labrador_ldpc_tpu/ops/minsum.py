"""Batched self-corrected min-sum decoder (XLA formulation).

TPU-native re-design of the reference's `decode_ms` (decoder.rs:347-475,
the normalization-free self-corrected min-sum of Savin, arXiv:0803.1090):

  * The reference processes ONE codeword with two serial sweeps over a lazy
    edge iterator. Here the batch is the parallel axis: all state is laid
    out node-major as (nodes, batch) so the batch rides the 128-wide lane
    dimension of the VPU, and every per-edge gather is a contiguous row
    gather (fast on TPU) driven by static index tables (codes/expand.py).
  * Check-node state is a dense (C, dc_max) grid; check reductions
    (min1/min2, sign product, parity) are masked axis reductions.
  * Variable-node accumulation follows the reference's exact per-variable
    edge order with sequential (saturating) adds, so f32/i8 results are
    bit-identical to the reference semantics (validated against the NumPy
    oracle in tests).
  * Early termination is a `lax.while_loop` over a per-codeword done mask:
    the loop exits when every codeword in the batch has satisfied all
    parity checks or `maxiters` is reached. Outputs freeze at each
    codeword's convergence iteration, matching the reference's return.

Supported LLR dtypes mirror `DecodeFrom` (decoder.rs:22-86): float32,
float64 (requires jax_enable_x64; CPU-oriented), bfloat16 (TPU-fast, not in
the reference), and int8/int16/int32 with saturating arithmetic. `alpha` enables normalized min-sum (float dtypes), a strict
superset knob: alpha=None reproduces the reference algorithm exactly.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..codes.expand import decoder_tables
from ..codes.params import LDPCCode, get_code

__all__ = ["make_ms_decoder", "decode_ms", "MSResult"]


class MSResult(NamedTuple):
    success: jnp.ndarray  # (B,) bool — all parity checks satisfied
    iterations: jnp.ndarray  # (B,) int32 — 0-based iteration of convergence, or maxiters
    bits: jnp.ndarray  # (B, n+p) uint8 — hard-decoded marginals (data in first k)


# --- dtype policies (reference DecodeFrom, decoder.rs:42-86) ---------------

# int LLRs use saturating arithmetic: int8/int16 widen to an int32
# accumulator and clip; int32 detects overflow on the wrapping add/sub
# directly (exact over the FULL int32 range, no x64 needed — see
# _sat_add). float64 requires jax.config.update("jax_enable_x64", True)
# and is CPU-oriented (TPUs have no native f64); it exists for DecodeFrom
# parity (decoder.rs:22-40).
_INT_KINDS = (jnp.dtype(jnp.int8), jnp.dtype(jnp.int16), jnp.dtype(jnp.int32))


def _is_int(dtype) -> bool:
    return jnp.dtype(dtype) in _INT_KINDS


def _acc_dtype(dtype):
    """Wider accumulator for saturating int8/int16 ops (int32 uses exact
    wrapping-overflow detection instead — see _sat_add/_sat_sub)."""
    return jnp.int32


def _maxval(dtype):
    d = jnp.dtype(dtype)
    if _is_int(d):
        return jnp.array(jnp.iinfo(d).max, dtype=d)
    return jnp.array(jnp.finfo(d).max, dtype=d)


def _sat_add(a, b, dtype):
    """Saturating add, exact over the FULL dtype range (decoder.rs:42-68).

    int8/int16 widen to int32 and clip; int32 instead detects overflow on
    the wrapping two's-complement add (XLA s32 add wraps): overflow iff the
    operands share a sign and the wrapped sum's sign differs — no int64 (so
    no jax_enable_x64 requirement) and no float round-off."""
    d = jnp.dtype(dtype)
    if d == jnp.dtype(jnp.int32):
        lo, hi = jnp.iinfo(d).min, jnp.iinfo(d).max
        s = a + b
        a_neg = a < 0
        ovf = jnp.logical_and(a_neg == (b < 0), (s < 0) != a_neg)
        return jnp.where(ovf, jnp.where(a_neg, lo, hi), s)
    if _is_int(d):
        lo, hi = jnp.iinfo(d).min, jnp.iinfo(d).max
        acc = _acc_dtype(d)
        return jnp.clip(a.astype(acc) + b.astype(acc), lo, hi).astype(d)
    return a + b


def _sat_sub(a, b, dtype):
    """Saturating sub; int32 overflows iff the operands' signs differ and
    the wrapped difference's sign differs from a's (see _sat_add)."""
    d = jnp.dtype(dtype)
    if d == jnp.dtype(jnp.int32):
        lo, hi = jnp.iinfo(d).min, jnp.iinfo(d).max
        s = a - b
        a_neg = a < 0
        ovf = jnp.logical_and(a_neg != (b < 0), (s < 0) != a_neg)
        return jnp.where(ovf, jnp.where(a_neg, lo, hi), s)
    if _is_int(d):
        lo, hi = jnp.iinfo(d).min, jnp.iinfo(d).max
        acc = _acc_dtype(d)
        return jnp.clip(a.astype(acc) - b.astype(acc), lo, hi).astype(d)
    return a - b


def _sat_abs(x, dtype):
    """Saturating abs: |INT_MIN| -> INT_MAX (decoder.rs:51-55)."""
    d = jnp.dtype(dtype)
    if d == jnp.dtype(jnp.int32):
        hi = jnp.iinfo(d).max
        # abs(INT_MIN) wraps back to INT_MIN; guard it explicitly
        return jnp.where(x == jnp.iinfo(d).min, hi, jnp.abs(x))
    if _is_int(d):
        hi = jnp.iinfo(d).max
        acc = _acc_dtype(d)
        return jnp.clip(jnp.abs(x.astype(acc)), 0, hi).astype(d)
    return jnp.abs(x)


def _hard(x):
    """hard_bit: negative -> True (decoder.rs:49,76)."""
    return x < 0


# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _device_tables(code: LDPCCode):
    # cached as host numpy (NOT jnp): converting under an active jit trace
    # would cache tracers (UnexpectedTracerError on reuse). jnp ops on these
    # stage them as per-trace constants.
    t = decoder_tables(code)
    return dict(
        check_nbrs_flat=np.ascontiguousarray(t.check_nbrs.reshape(-1), dtype=np.int32),
        check_mask=np.ascontiguousarray(t.check_mask[:, :, None]),  # (C, dc, 1)
        var_edge_idx=np.ascontiguousarray(t.var_edge_idx, dtype=np.int32),  # (V, dv)
        var_check_idx=np.ascontiguousarray(t.var_check_idx, dtype=np.int32),
        var_mask=np.ascontiguousarray(t.var_mask),
        meta=t,
    )


def make_ms_decoder(
    code: LDPCCode | str,
    dtype=jnp.float32,
    maxiters: int = 20,
    alpha: float | None = None,
):
    """Build a jitted batched min-sum decoder.

    Returns fn(llrs: (B, n) dtype) -> MSResult. Positive LLRs favor bit 0.
    """
    code = get_code(code)
    p = code.params
    dtype = jnp.dtype(dtype)
    if alpha is not None and _is_int(dtype):
        raise ValueError("normalized min-sum (alpha) requires a float dtype")
    tabs = _device_tables(code)
    t = tabs["meta"]
    Cn, Vn, dc, dv = t.n_checks, t.n_vars, t.dc_max, t.dv_max
    n = p.n
    maxval = _maxval(dtype)

    check_nbrs_flat = tabs["check_nbrs_flat"]  # (C*dc,) values in [0, V]
    check_mask = tabs["check_mask"]  # (C, dc, 1) bool
    var_edge_idx = tabs["var_edge_idx"]  # (V, dv) values in [0, C*dc]
    alpha_c = None if alpha is None else jnp.array(alpha, dtype=dtype)

    def decode(llrs: jnp.ndarray) -> MSResult:
        llrs = jnp.asarray(llrs, dtype=dtype)
        assert llrs.ndim == 2 and llrs.shape[1] == n, f"llrs must be (B, {n})"
        B = llrs.shape[0]
        llr_t = llrs.T  # (n, B) node-major
        llr_ext = jnp.concatenate([llr_t, jnp.zeros((Vn - n, B), dtype)], axis=0)

        def body_fn(state):
            v, min1, min2, sgn, done, iters, va_out, it = state

            # ---- sweep 1: check->variable messages u, accumulate marginals
            # u[e] = +-(min1 or min2)[check]  (decoder.rs:388-405)
            absv = _sat_abs(v, dtype)
            mag = jnp.where(absv == min1[:, None, :], min2[:, None, :], min1[:, None, :])
            if alpha_c is not None:
                mag = alpha_c * mag
            neg = jnp.logical_xor(sgn[:, None, :], _hard(v))
            u = jnp.where(neg, -mag, mag)  # (C, dc, B)

            # va = llr_ext + sum of u over each variable's edges, in the
            # reference's per-variable order with per-step saturation
            # (decoder.rs:408). One sentinel zero row serves all pad slots.
            u_flat = jnp.concatenate([u.reshape(Cn * dc, B), jnp.zeros((1, B), dtype)], axis=0)
            va = llr_ext
            for j in range(dv):
                va = _sat_add(va, jnp.take(u_flat, var_edge_idx[:, j], axis=0), dtype)

            # ---- sweep 2: v with self-correction; check stats --------------
            va_ext = jnp.concatenate([va, jnp.zeros((1, B), dtype)], axis=0)
            va_e = jnp.take(va_ext, check_nbrs_flat, axis=0).reshape(Cn, dc, B)
            new_v = _sat_sub(va_e, u, dtype)
            keep = jnp.logical_or(_hard(new_v) == _hard(v), v == 0)
            v_next = jnp.where(keep, new_v, jnp.zeros((), dtype))  # (decoder.rs:420-426)

            a = jnp.where(check_mask, _sat_abs(v_next, dtype), maxval)
            min1_n = a.min(axis=1)  # (C, B)
            first = jnp.argmin(a, axis=1)  # first occurrence on ties
            slot = jnp.arange(dc, dtype=jnp.int32)[None, :, None]
            a2 = jnp.where(slot == first[:, None, :], maxval, a)
            min2_n = a2.min(axis=1)

            negs = jnp.logical_and(_hard(v_next), check_mask)
            sgn_n = (negs.sum(axis=1, dtype=jnp.int32) & 1).astype(bool)  # (C, B)

            par = jnp.logical_and(_hard(va_e), check_mask).sum(axis=1, dtype=jnp.int32) & 1
            check_ok = (par == 0).all(axis=0)  # (B,)

            newly_done = jnp.logical_and(check_ok, jnp.logical_not(done))
            # freeze marginals for codewords that are not done yet (so
            # converged codewords keep the marginals of their convergence
            # iteration and failures keep the last iteration's)
            va_out = jnp.where(done[None, :], va_out, va)
            iters = jnp.where(newly_done, it, iters)
            done = jnp.logical_or(done, check_ok)
            return v_next, min1_n, min2_n, sgn_n, done, iters, va_out, it + 1

        def cond_fn(state):
            *_, done, _iters, _va, it = state
            return jnp.logical_and(it < maxiters, jnp.logical_not(done.all()))

        v0 = jnp.zeros((Cn, dc, B), dtype)
        z_cb = jnp.zeros((Cn, B), dtype)
        state = (
            v0,
            z_cb,  # min1 = 0 (reference zeroes the working area, decoder.rs:374)
            z_cb,  # min2 = 0
            jnp.zeros((Cn, B), bool),  # sign products
            jnp.zeros((B,), bool),  # done
            jnp.full((B,), maxiters, jnp.int32),  # iters (maxiters on failure)
            llr_ext,  # va_out placeholder (overwritten on first iteration)
            jnp.zeros((), jnp.int32),  # iteration counter
        )
        *_, done, iters, va_out, _ = jax.lax.while_loop(cond_fn, body_fn, state)
        bits = _hard(va_out).T.astype(jnp.uint8)  # (B, V)
        return MSResult(success=done, iterations=iters, bits=bits)

    return jax.jit(decode)


@lru_cache(maxsize=None)
def _cached_decoder(code: LDPCCode, dtype_name: str, maxiters: int, alpha, impl):
    if impl == "ref":
        return make_ms_decoder(code, jnp.dtype(dtype_name), maxiters, alpha)
    # every other impl routes through the shared registry (lazy import:
    # channel.awgn imports this module)
    from ..channel.awgn import _make_decoder

    return _make_decoder(code, jnp.dtype(dtype_name), maxiters, alpha, impl)


def decode_ms(
    code: LDPCCode | str,
    llrs: jnp.ndarray,
    maxiters: int = 20,
    alpha: float | None = None,
    impl: str = "auto",
) -> MSResult:
    """Convenience batched decode; the compiled decoder is cached per
    (code, dtype, maxiters, alpha, impl).

    `impl` selects the implementation. The default "auto" resolves to the
    measured-best production path for the current backend (the fused
    Pallas kernels on TPU — ~1.8M TM8192 cw/s/chip — the XLA layered
    schedule elsewhere; `channel.awgn.resolve_impl` is the routing table),
    matching the reference's single production entry point decode_ms
    (decoder.rs:347-351). Pass "ref" for the reference-order decoder,
    bit-exact vs the scalar oracle for every dtype (the differential-test
    anchor); "qc"/"layered" (gather-free XLA) and
    "pallas_qc"/"pallas_layered" (VMEM-resident fused TPU kernels, all
    nine codes) force specific fast paths — same decode outcomes,
    validated statistically (see channel.awgn._make_decoder for the full
    matrix and dtype rules).
    """
    code = get_code(code)
    dtype_name = str(jnp.asarray(llrs).dtype)
    # resolve "auto" before the cache so the cache keys on the concrete
    # impl (and the one-time dtype guidance fires at most once per config)
    from ..channel.awgn import resolve_impl

    impl = resolve_impl(code, dtype_name, impl)
    return _cached_decoder(code, dtype_name, maxiters, alpha, impl)(llrs)
