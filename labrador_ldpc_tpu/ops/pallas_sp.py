"""VMEM-resident row-layered SUM-PRODUCT Pallas kernel (round 5).

The sum-product yardstick (ops/sumproduct.py) measured the reference's
"very close to optimal" claim — and exposed a quality mode worth
shipping fast: SP reaches 12/4096 frame errors where min-sum sees 175
(TM8192 @1.1 dB), but the XLA gather formulation runs at ~1.5k cw/s
(HBM-streamed (C, dc, B) state + transcendentals). This kernel fuses the
LAYERED schedule of make_sp_decoder_layered into the same VMEM-resident
structure as the production min-sum kernels (ops/pallas_qc.py): grid
over the batch, whole decode state (check messages u, carried
posteriors) in VMEM scratch across the early-exiting while_loop,
permutations as static lane rolls, lane-parts carriage where routed.

Differences from the min-sum kernel: the check update is the phi rule
  |u_e| = phi(sum_{e'!=e} phi(|t_e'|)),  phi(x) = -ln tanh(x/2)
(computed as log1p-free exp/log pairs, |t| clamped to [PHI_EPS,
PHI_CLIP]) instead of two-min; there is no self-correction and no t'
plane (u is stored; t is recomputed per layer), so scratch is one
(sumA, B, M) plane LIGHTER than the min-sum kernel's. f32 only; expects
TRUE channel LLRs (2y/sigma^2 — BP is not scale-invariant).

Bit-exact vs make_sp_decoder_layered (bits/success/iterations) — pinned
interpret-mode in tests and compiled on real TPU. Lane-major codes
(M >= 512) only; smaller codes fall back to the XLA layered twin (SP is
not wanted there anyway: self-corrected min-sum BEATS plain BP on the
short-cycle TC codes, benchmarks/results/sp_ms_gap.csv).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..codes.expand import qc_structure
from ..codes.params import LDPCCode, get_code
from ..sizes import sp_layered_scratch_specs
from .minsum import MSResult
from .pallas_qc import _lane_part_fns
from .sumproduct import PHI_CLIP, PHI_EPS

__all__ = ["make_sp_decoder_pallas"]


def make_sp_decoder_pallas(
    code: LDPCCode | str,
    maxiters: int = 100,
    batch_tile: int | None = None,
    interpret: bool = False,
):
    """Build the fused VMEM-resident layered sum-product decoder (f32).

    Returns fn(llrs: (B, n) f32) -> MSResult. Same conventions as
    make_sp_decoder_layered, which it is bit-exact against.
    """
    code = get_code(code)
    from .routing import route_for

    route = route_for(code)
    if route.ms_layout == "node_major":
        # M <= 256: SP is not a production surface there (min-sum beats
        # plain BP on the short-cycle codes) — serve the XLA twin
        from .sumproduct import make_sp_decoder_layered

        return make_sp_decoder_layered(code, maxiters)
    p = code.params
    s = qc_structure(code)
    M, R, Cc = s.m, s.n_block_rows, s.n_block_cols
    n, V = p.n, Cc * M
    sumA = sum(len(r) for r in s.rows)
    B = route.ms_batch_tile if batch_tile is None else batch_tile
    f32 = jnp.float32
    i32 = jnp.int32
    P, q, fwd_parts, inv_parts = _lane_part_fns(s, route.ms_lane_parts)
    row_off = [0]
    for row in s.rows:
        row_off.append(row_off[-1] + len(row))

    def phi(x):
        # the EXACT f32 expression of sumproduct._phi (the twin) — the
        # bit-exactness pin depends on expression identity
        x = jnp.clip(x, PHI_EPS, PHI_CLIP)
        em = jnp.exp(-x)
        return jnp.log((1.0 + em) / (1.0 - em))

    def kernel(
        llr_ref,  # (B, n) f32 VMEM block
        bits_ref,  # out: (B, V) uint8
        done_ref,  # out: (B, 1) f32
        iters_ref,  # out: (B, 1) i32
        us_ref,  # scratch: (sumA, B, M) f32 check->var messages
        va_ref,  # scratch: (B, V) f32 posteriors (carried)
        frozen_ref,  # scratch: (B, V) i32
        fdone_ref,  # scratch: (B, 1) f32
        fiters_ref,  # scratch: (B, 1) i32
    ):
        def vparts(base):
            return [
                va_ref[:, base + j * q : base + (j + 1) * q] for j in range(P)
            ]

        def eparts(e):
            return [us_ref[e, :, j * q : (j + 1) * q] for j in range(P)]

        def weparts(e, parts):
            for j, x in enumerate(parts):
                us_ref[e, :, j * q : (j + 1) * q] = x

        fdone_ref[...] = jnp.zeros((B, 1), f32)
        fiters_ref[...] = jnp.full((B, 1), maxiters, i32)
        frozen_ref[...] = jnp.zeros((B, V), i32)
        va_ref[:, :n] = llr_ref[...]
        if V > n:  # punctured tail LLR 0
            va_ref[:, n:] = jnp.zeros((B, V - n), f32)

        def one_iteration(it, first):
            """One layered BP iteration; `first` peels iteration 0
            (u = 0: t = posterior view, du = u)."""
            for r, row in enumerate(s.rows):
                # extrinsics + phi accumulation over the layer
                ts, phs = [], []
                phi_sum = None
                sg = None
                for a, perm in enumerate(row):
                    e = row_off[r] + a
                    g = fwd_parts(vparts(perm.col * M), perm)
                    if first:
                        t = g
                    else:
                        t = [gi - ui for gi, ui in zip(g, eparts(e))]
                    ts.append(t)
                    ph = [phi(jnp.abs(x)) for x in t]
                    phs.append(ph)
                    if phi_sum is None:
                        phi_sum = list(ph)
                        sg = [x < 0.0 for x in t]
                    else:
                        phi_sum = [a_ + b_ for a_, b_ in zip(phi_sum, ph)]
                        sg = [
                            jnp.logical_xor(s_, x < 0.0)
                            for s_, x in zip(sg, t)
                        ]
                # new u; posterior update va += perm_inv(u - u_old)
                for a, perm in enumerate(row):
                    e = row_off[r] + a
                    c0 = perm.col * M
                    u = []
                    for j in range(P):
                        mag = phi(phi_sum[j] - phs[a][j])
                        neg = jnp.logical_xor(sg[j], ts[a][j] < 0.0)
                        u.append(jnp.where(neg, -mag, mag))
                    if first:
                        du = u
                    else:
                        du = [ui - uo for ui, uo in zip(u, eparts(e))]
                    dv = inv_parts(du, perm)
                    for j in range(P):
                        va_ref[:, c0 + j * q : c0 + (j + 1) * q] += dv[j]
                    weparts(e, u)
            # end-of-iteration syndrome + freeze (same as the ms kernel)
            sign_parts = [
                [
                    (va_ref[:, c * M + j * q : c * M + (j + 1) * q] < 0.0
                     ).astype(i32)
                    for j in range(P)
                ]
                for c in range(Cc)
            ]
            ok = jnp.ones((B, 1), f32)
            for r, row in enumerate(s.rows):
                par = None
                for perm in row:
                    g = fwd_parts(sign_parts[perm.col], perm)
                    par = g if par is None else [
                        x ^ y for x, y in zip(par, g)
                    ]
                for x in par:
                    ok = ok * jnp.min(
                        1.0 - x.astype(f32), axis=1, keepdims=True
                    )
            done = fdone_ref[...]
            newly = ok * (1.0 - done)
            for c in range(Cc):
                for j in range(P):
                    sl = slice(c * M + j * q, c * M + (j + 1) * q)
                    frozen_ref[:, sl] = jnp.where(
                        newly > 0.0, sign_parts[c][j], frozen_ref[:, sl]
                    )
            fiters_ref[...] = jnp.where(
                newly > 0.0, jnp.full((B, 1), 1, i32) * it, fiters_ref[...]
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
        signs = (va_ref[...] < 0.0).astype(i32)
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
                pl.BlockSpec((B, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=[
                pl.BlockSpec((B, V), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM(sh, dt)
                for sh, dt in sp_layered_scratch_specs(sumA, V, M, B)
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
        llrs = jnp.asarray(llrs, f32)
        assert llrs.ndim == 2 and llrs.shape[1] == n, f"llrs must be (B, {n})"
        batch = llrs.shape[0]
        pad = (-batch) % B
        if pad:
            llrs = jnp.concatenate([llrs, jnp.ones((pad, n), f32)], axis=0)
        bits_u8, done_f, iters = build(batch + pad)(llrs)
        return MSResult(
            success=done_f[:batch, 0] > 0.0,
            iterations=iters[:batch, 0],
            bits=bits_u8[:batch],
        )

    return decode
