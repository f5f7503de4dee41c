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

__all__ = ["make_sp_decoder"]

PHI_EPS = 1e-6
PHI_CLIP = 25.0


def _phi(x):
    # -ln tanh(x/2), x clamped into (0, PHI_CLIP]; phi is its own inverse
    x = jnp.clip(x, PHI_EPS, PHI_CLIP)
    return -jnp.log(jnp.tanh(0.5 * x))


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
