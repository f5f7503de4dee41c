"""VMEM-resident QC bit-flip decoder as a single Pallas TPU kernel.

Same flip-all-at-max Gallager algorithm as the reference `decode_bf`
(decoder.rs:243-301) in the QC roll formulation of ops/bitflip.py's
`make_bf_decoder_qc` — and bit-exact against it (integer counts carried in
f32 lanes are exact; the flip rule is deterministic).

Why a kernel: the bit-flip state per codeword is tiny — V hard bits plus V
violation counts, no per-edge messages — so the XLA path's per-iteration
HBM streaming dominates its runtime on the large TM codes. Here the grid
tiles the batch and one grid step keeps its tile's bits and counts in VMEM
for the entire early-exiting iteration loop, exactly like the min-sum
kernels in ops/pallas_qc.py (whose `_static_perm_fns` lane-roll machinery
this file reuses). Per iteration each block-edge costs just four M-wide
vector ops (roll+add for parity, roll+add for the violation scatter), ~4x
fewer than the min-sum kernels' edge sweeps.

Punctured (TM) codes run the erasure preprocessor (decode_erasures_bits'
single voting pass, decoder.rs:144-223) INSIDE the kernel: the erased set
is static (exactly the punctured tail, lanes v >= n), so the per-check
erased-neighbor counts fold to compile-time (1, M) constants and the pass
costs one roll+add sweep for parity plus one for the vote scatter — the
same shape as a bit-flip iteration. (A first cut ran the XLA gather-based
erasure pass outside the kernel; it dominated end-to-end time, 157k cw/s
vs this version's measured rate.) This file lowers the lane-tile-multiple
submatrix sizes directly (M % 128 == 0); production dispatch sends
M <= 256 (the TC codes plus TM1280/TM1536) to the transposed node-major
kernel in ops/pallas_tc.py (`bf_node_major` — sublane rolls, quartered pi
parts, trace-time-gated erasure votes), so `make_bf_decoder_pallas`
covers all 9 codes like the min-sum factories; the M >= 512 TM codes
lower here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..codes.expand import qc_structure
from ..codes.params import LDPCCode, get_code
from ..sizes import bf_scratch_specs
from .bitflip import BFResult
from .pallas_qc import _static_perm_fns


__all__ = ["make_bf_decoder_pallas"]


def make_bf_decoder_pallas(
    code: LDPCCode | str,
    maxiters: int = 20,
    batch_tile: int | None = None,
    interpret: bool = False,
):
    """VMEM-resident batched bit-flip decoder (fused Pallas TPU kernel).

    Bit-exact vs `make_bf_decoder_qc` / `make_bf_decoder` (bits, success,
    iterations — including the erasure preprocessor's accounting on the
    punctured TM codes). Returns fn(hard_bits: (B, n) int) -> BFResult.

    `batch_tile` means different things per dispatch target: for TM codes
    (this kernel) it tiles SUBLANES and small values are legal; for TC
    codes it is forwarded to the transposed kernel (ops/pallas_tc.py)
    where the batch rides the 128 LANES, so it must be a multiple of 128
    when compiled for real TPU (validated in pallas_tc._resolve_batch_tile;
    interpret mode is exempt).
    """
    code = get_code(code)
    p = code.params
    s = qc_structure(code)
    M, R, Cc = s.m, s.n_block_rows, s.n_block_cols
    from .routing import route_for

    route = route_for(code)
    if route.bf_layout == "node_major":
        # TC + TM1280/TM1536: transposed node-major kernel (sublane
        # rolls; quartered pi parts + trace-time-gated erasure pass for
        # the TM codes) — see ops/pallas_tc.py. Same dispatch pattern as
        # the min-sum factories; per-code provenance in ops/routing.py.
        from .pallas_tc import make_bf_decoder_pallas_tc

        return make_bf_decoder_pallas_tc(
            code, maxiters=maxiters, batch_tile=batch_tile, interpret=interpret
        )
    if M % 128:
        raise ValueError(
            f"pallas bf decoder needs a lane-tile-multiple submatrix size "
            f"(M %% 128 == 0); {code.name} has M={M} — use "
            f"make_bf_decoder_qc"
        )
    n, V = p.n, Cc * M
    B = route.bf_batch_tile if batch_tile is None else batch_tile
    f32 = jnp.float32
    fwd_perm, inv_perm = _static_perm_fns(M)

    # The erased set is exactly the punctured tail (vars v >= n), known at
    # build time; inside the kernel the per-block erased masks are iota
    # compares (Pallas kernels cannot capture array constants), and the
    # per-check erased-neighbor counts cost one extra one-time roll sweep.

    def kernel(
        in_ref,  # (B, V) f32 hard bits 0/1 (punctured tail zeroed)
        bits_ref,  # out: (B, V) uint8
        done_ref,  # out: (B, 1) f32
        iters_ref,  # out: (B, 1) i32
        b_ref,  # scratch: (B, V) f32 working bits
        viol_ref,  # scratch: (B, V) f32 violation counts / erasure votes
        fdone_ref,  # scratch: (B, 1) f32
        fiters_ref,  # scratch: (B, 1) i32
    ):
        fdone_ref[...] = jnp.zeros((B, 1), f32)
        fiters_ref[...] = jnp.full((B, 1), maxiters, jnp.int32)
        b_ref[...] = in_ref[...]

        if p.punctured_bits > 0:
            # one erasure voting pass (decode_erasures_bits semantics). The
            # erased set is static — exactly the punctured tail (v >= n) —
            # so the per-block erased masks are (1, M) iota compares and
            # the per-check erased-neighbor counts ecount cost one extra
            # one-time roll sweep over constant planes. The punctured tail
            # is zero, so the parity over non-erased bits is just the
            # parity of the current planes; checks with exactly one erased
            # neighbor vote +1 on parity 1 / -1 on parity 0, and erased
            # vars with positive vote totals are set to 1
            # (decoder.rs:172-218).
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
            erased_col = [
                jnp.broadcast_to((lane >= n - c * M).astype(f32), (B, M))
                if n - c * M < M
                else jnp.zeros((B, M), f32)
                for c in range(Cc)
            ]
            viol_ref[...] = jnp.zeros((B, V), f32)
            for r in range(R):
                par = None
                ecount = None
                for perm in s.rows[r]:
                    c0 = perm.col * M
                    g = fwd_perm(b_ref[:, c0 : c0 + M], perm)
                    par = g if par is None else par + g
                    e = fwd_perm(erased_col[perm.col], perm)
                    ecount = e if ecount is None else ecount + e
                par = par - 2.0 * jnp.floor(par * 0.5)  # mod 2
                gate = jnp.where(ecount == 1.0, 1.0, 0.0)
                vote = gate * (2.0 * par - 1.0)
                for perm in s.rows[r]:
                    c0 = perm.col * M
                    viol_ref[:, c0 : c0 + M] += inv_perm(vote, perm)
            for c in range(Cc):
                if n - c * M >= M:  # block has no erased lanes
                    continue
                c0 = c * M
                fix = jnp.logical_and(
                    erased_col[c] > 0.0, viol_ref[:, c0 : c0 + M] > 0.0
                )
                b_ref[:, c0 : c0 + M] = jnp.where(
                    fix, 1.0, b_ref[:, c0 : c0 + M]
                )

        def one_iteration(it):
            # check parities per block row: f32 adds of permuted bit planes,
            # one mod-2 per row (cheaper than per-edge XOR selects)
            bits_blocks = [b_ref[:, c * M : (c + 1) * M] for c in range(Cc)]
            viol_ref[...] = jnp.zeros((B, V), f32)
            for r in range(R):
                par = None
                for perm in s.rows[r]:
                    g = fwd_perm(bits_blocks[perm.col], perm)
                    par = g if par is None else par + g
                par = par - 2.0 * jnp.floor(par * 0.5)  # mod 2
                # violation counts: scatter this row's parity back to its vars
                for perm in s.rows[r]:
                    c0 = perm.col * M
                    viol_ref[:, c0 : c0 + M] += inv_perm(par, perm)
            # per-codeword max violation count across all V variables
            mx = jnp.max(viol_ref[...], axis=1, keepdims=True)  # (B, 1)
            ok = jnp.where(mx == 0.0, 1.0, 0.0)
            # flip ALL variables at the max (decoder.rs:288-296); converged
            # codewords have mx == 0, so their bits freeze naturally
            flip = jnp.logical_and(viol_ref[...] == mx, mx > 0.0)
            b_ref[...] = jnp.where(flip, 1.0 - b_ref[...], b_ref[...])
            # convergence accounting (parity was already zero at entry)
            done = fdone_ref[...]
            newly = ok * (1.0 - done)
            fiters_ref[...] = jnp.where(
                newly > 0.0, jnp.full((B, 1), 1, jnp.int32) * it, fiters_ref[...]
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
                pl.BlockSpec((B, V), lambda i: (i, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=[
                pl.BlockSpec((B, V), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            # shapes sourced from sizes.py (sizes.bf_scratch_specs)
            scratch_shapes=[
                pltpu.VMEM(sh, dt)
                for sh, dt in bf_scratch_specs(V, B, node_major=False)
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
    def decode(hard_bits: jnp.ndarray) -> BFResult:
        assert hard_bits.ndim == 2 and hard_bits.shape[1] == n, (
            f"hard_bits must be (B, {n})"
        )
        batch = hard_bits.shape[0]
        # punctured tail zeroed; the erasure repair happens inside the
        # kernel. Its iteration accounting contributes 0 to `iterations`
        # (the reference quirk: decode_erasures always succeeds at
        # iteration 0 — decoder.rs:205-218, ops/bitflip.py docstring).
        planes = jnp.concatenate(
            [jnp.asarray(hard_bits, f32), jnp.zeros((batch, V - n), f32)],
            axis=1,
        )
        pad = (-batch) % B
        if pad:
            # all-zero pad codewords satisfy every check and exit immediately
            planes = jnp.concatenate([planes, jnp.zeros((pad, V), f32)], axis=0)
        bits_u8, done_f, iters = build(batch + pad)(planes)
        return BFResult(
            success=done_f[:batch, 0] > 0.0,
            iterations=iters[:batch, 0],
            bits=bits_u8[:batch],
        )

    return decode
