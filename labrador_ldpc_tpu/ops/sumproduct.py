"""Flooding sum-product (belief propagation) decoder — validation grade.

The reference claims its min-sum decoder "performs very close to the
optimal sum-product algorithm" (/root/reference/src/lib.rs:217-218) but
ships no sum-product decoder to check against. This module provides one
so the claim can be MEASURED (round 5: tools/gen_sp_gap.py walks both
decoders' FER curves to the 1e-3 crossing; numbers in STATUS.md).

Standard tanh-rule BP in the phi formulation, f32, batched over the same
dense gather tables as ops/minsum.py (nodes-major (C, dc, B) edge state):

  check:  |u_e| = phi( sum_{e' != e} phi(|v_e'|) ),  phi(x) = -ln tanh(x/2)
          sign(u_e) = XOR of the other edges' signs
  var:    va = llr + sum u;  v_e = va - u_e
  exit:   all checks satisfied on hard(va) (same convention as minsum)

phi is its own inverse; |v| is clamped to [PHI_EPS, PHI_CLIP] for
numerical stability (phi(0) = inf), the standard practical-BP clamp.
This is NOT a production path (no Pallas kernel, no int dtypes, no
self-correction knob): it exists as the optimality yardstick the
reference cites but never instantiates. Exposed in the harness as
impl="sp" (float32 only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..codes.params import LDPCCode, get_code
from .minsum import MSResult, _device_tables
from .qc_minsum import _MSB_W

__all__ = ["make_sp_decoder", "make_sp_decoder_layered"]

PHI_EPS = 1e-6
PHI_CLIP = 25.0


def _phi(x):
    # -ln tanh(x/2), x clamped into (0, PHI_CLIP]; phi is its own inverse.
    # Written in the exp/log form (tanh(x/2) = (1 - e^-x)/(1 + e^-x)) so
    # the XLA twins and the fused Pallas kernel (ops/pallas_sp.py) share
    # the exact f32 expression — the kernel's bit-exactness pin depends
    # on it.
    x = jnp.clip(x, PHI_EPS, PHI_CLIP)
    em = jnp.exp(-x)
    return jnp.log((1.0 + em) / (1.0 - em))


def make_sp_decoder(code: LDPCCode | str, maxiters: int = 100):
    """Build a jitted batched sum-product decoder (f32).

    Returns fn(llrs: (B, n) float32) -> MSResult; same conventions as
    make_ms_decoder (positive LLR -> bit 0; punctured tail LLR 0; early
    exit on the syndrome; iterations 0-based at convergence).
    """
    code = get_code(code)
    p = code.params
    tabs = _device_tables(code)
    t = tabs["meta"]
    Cn, Vn, dc, dv = t.n_checks, t.n_vars, t.dc_max, t.dv_max
    n = p.n
    f32 = jnp.float32
    check_nbrs_flat = tabs["check_nbrs_flat"]  # (C*dc,) in [0, V]
    check_mask = tabs["check_mask"]  # (C, dc, 1) bool
    var_edge_idx = tabs["var_edge_idx"]  # (V, dv) in [0, C*dc]

    def decode(llrs: jnp.ndarray) -> MSResult:
        llrs = jnp.asarray(llrs, f32)
        assert llrs.ndim == 2 and llrs.shape[1] == n, f"llrs must be (B, {n})"
        B = llrs.shape[0]
        llr_ext = jnp.concatenate(
            [llrs.T, jnp.zeros((Vn - n, B), f32)], axis=0
        )
        # v initialized from the channel (standard BP init): v_e = llr[var]
        va_ext0 = jnp.concatenate([llr_ext, jnp.zeros((1, B), f32)], axis=0)
        v0 = jnp.take(va_ext0, check_nbrs_flat, axis=0).reshape(Cn, dc, B)

        def body_fn(state):
            v, done, iters, va_out, it = state

            # ---- check update (phi formulation, leave-one-out) ----------
            phis = jnp.where(check_mask, _phi(jnp.abs(v)), 0.0)
            phi_sum = phis.sum(axis=1, keepdims=True)
            mag = _phi(phi_sum - phis)  # phi is self-inverse
            neg = jnp.logical_and(v < 0.0, check_mask)
            sgn_tot = neg.sum(axis=1, dtype=jnp.int32) & 1  # (C, B)
            sign_e = jnp.logical_xor(sgn_tot[:, None, :] == 1, neg)
            u = jnp.where(check_mask, jnp.where(sign_e, -mag, mag), 0.0)

            # ---- variable update ---------------------------------------
            u_flat = jnp.concatenate(
                [u.reshape(Cn * dc, B), jnp.zeros((1, B), f32)], axis=0
            )
            va = llr_ext
            for j in range(dv):
                va = va + jnp.take(u_flat, var_edge_idx[:, j], axis=0)
            va_ext = jnp.concatenate([va, jnp.zeros((1, B), f32)], axis=0)
            va_e = jnp.take(va_ext, check_nbrs_flat, axis=0).reshape(Cn, dc, B)
            v_next = va_e - u

            # ---- syndrome / early exit ---------------------------------
            par = jnp.logical_and(va_e < 0.0, check_mask).sum(
                axis=1, dtype=jnp.int32
            ) & 1
            check_ok = (par == 0).all(axis=0)
            newly = jnp.logical_and(check_ok, jnp.logical_not(done))
            va_out = jnp.where(done[None, :], va_out, va)
            iters = jnp.where(newly, it, iters)
            done = jnp.logical_or(done, check_ok)
            return v_next, done, iters, va_out, it + 1

        def cond_fn(state):
            _, done, _iters, _va, it = state
            return jnp.logical_and(it < maxiters, jnp.logical_not(done.all()))

        state = (
            v0,
            jnp.zeros((B,), bool),
            jnp.full((B,), maxiters, jnp.int32),
            llr_ext,
            jnp.zeros((), jnp.int32),
        )
        _, done, iters, va_out, _ = jax.lax.while_loop(cond_fn, body_fn, state)
        bits = (va_out.T < 0.0).astype(jnp.uint8)  # (B, V)
        return MSResult(success=done, iterations=iters, bits=bits)

    return jax.jit(decode)


def make_sp_decoder_layered(code: LDPCCode | str, maxiters: int = 100):
    """Row-layered sum-product (QC roll formulation, XLA) — the twin of
    the fused Pallas SP kernel (ops/pallas_qc.make_sp_decoder_pallas),
    mirroring make_ms_decoder_layered's structure: block-rows processed
    sequentially, each consuming posteriors already updated by previous
    layers (faster convergence than flooding BP), posteriors carried
    across iterations, end-of-iteration syndrome, per-codeword freeze.

    Check update is the phi rule (module docstring) instead of two-min;
    no self-correction (a min-sum-specific damping rule). f32 only;
    expects TRUE channel LLRs.
    """
    from ..codes.expand import qc_structure
    from .convert import unpack_bits
    from .qc_minsum import perm_rows

    code = get_code(code)
    p = code.params
    s = qc_structure(code)
    M, R, Cc = s.m, s.n_block_rows, s.n_block_cols
    n = p.n
    n_blocks = n // M
    f32 = jnp.float32
    row_off = [0]
    for row in s.rows:
        row_off.append(row_off[-1] + len(row))
    sumA = row_off[-1]

    def decode(llrs: jnp.ndarray) -> MSResult:
        llrs = jnp.asarray(llrs, f32)
        assert llrs.ndim == 2 and llrs.shape[1] == n, f"llrs must be (B, {n})"
        B = llrs.shape[0]
        llr_t = llrs.T
        zero_blk = jnp.zeros((M, B), f32)
        llr_blocks = tuple(
            llr_t[c * M : (c + 1) * M] for c in range(n_blocks)
        ) + tuple(zero_blk for _ in range(Cc - n_blocks))

        def body_fn(state):
            us, va, done, iters, state_bits, it = state
            va = list(va)
            new_us = list(us)
            for r in range(R):
                row = s.rows[r]
                # extrinsics t = va - u_old for every addend of the layer
                ts = []
                for a, perm in enumerate(row):
                    e = row_off[r] + a
                    g = perm_rows(va[perm.col], perm)
                    ts.append(g - us[e])
                # phi-rule check update over the layer's addends
                phis = [_phi(jnp.abs(t)) for t in ts]
                phi_sum = phis[0]
                for ph in phis[1:]:
                    phi_sum = phi_sum + ph
                neg = [t < 0.0 for t in ts]
                sg = neg[0]
                for ngg in neg[1:]:
                    sg = jnp.logical_xor(sg, ngg)
                for a, perm in enumerate(row):
                    e = row_off[r] + a
                    mag = _phi(phi_sum - phis[a])
                    sign_e = jnp.logical_xor(sg, neg[a])
                    u = jnp.where(sign_e, -mag, mag)
                    du = perm_rows(u - us[e], perm, inverse=True)
                    va[perm.col] = va[perm.col] + du
                    new_us[e] = u
            # end-of-iteration syndrome over final posteriors
            signs = [(va[c] < 0.0).astype(jnp.uint8) for c in range(Cc)]
            ok = jnp.ones((B,), bool)
            for r in range(R):
                par = jnp.zeros((M, B), jnp.uint8)
                for perm in s.rows[r]:
                    par = par ^ perm_rows(signs[perm.col], perm)
                ok = jnp.logical_and(ok, (par == 0).all(axis=0))
            packed = jnp.concatenate(
                [
                    ((va[c] < 0.0).reshape(M // 8, 8, B).astype(jnp.uint8)
                     * _MSB_W).sum(axis=1).astype(jnp.uint8)
                    for c in range(Cc)
                ],
                axis=0,
            )
            newly = jnp.logical_and(ok, jnp.logical_not(done))
            bits_out = jnp.where(done[None, :], state_bits, packed)
            iters = jnp.where(newly, it, iters)
            done = jnp.logical_or(done, ok)
            return tuple(new_us), tuple(va), done, iters, bits_out, it + 1

        def cond_fn(state):
            _, _, done, _i, _b, it = state
            return jnp.logical_and(it < maxiters, jnp.logical_not(done.all()))

        state = (
            tuple(jnp.zeros((M, B), f32) for _ in range(sumA)),
            llr_blocks,
            jnp.zeros((B,), bool),
            jnp.full((B,), maxiters, jnp.int32),
            jnp.zeros((Cc * M // 8, B), jnp.uint8),
            jnp.zeros((), jnp.int32),
        )
        *_, done, iters, bits_out, _ = jax.lax.while_loop(
            cond_fn, body_fn, state
        )
        bits = unpack_bits(bits_out.T)
        return MSResult(success=done, iterations=iters, bits=bits)

    return jax.jit(decode)
