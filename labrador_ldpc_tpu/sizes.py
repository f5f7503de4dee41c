"""Per-code memory/size tables: the `src/lib.rs:146-200` analog.

The reference crate devotes its crate docs to per-code RAM tables (decode
working-area sizes per LLR type, output lengths) because its no-alloc
embedded callers must size buffers by hand. The TPU analog of "how do I
size my buffers" is "how do I size my BATCH": what a user needs here is,
per code x decoder implementation,

  * the measured default batch tile of the fused Pallas kernels,
  * the VMEM scratch one grid step requests (decode state for one tile),
  * decoder state bytes per codeword (scratch / tile),
  * HBM traffic per codeword per decode — which for the VMEM-resident
    kernels is ITERATION-INDEPENDENT (one LLR read + one hard-bit write),
    the property that moves them off the HBM roofline (docs/DESIGN.md).

This module is the SINGLE SOURCE OF TRUTH for the Pallas kernels' VMEM
scratch shapes: ops/pallas_qc.py, ops/pallas_tc.py and ops/pallas_bf.py
build their `pltpu.VMEM` scratch lists from the `*_scratch_specs`
functions below (same order as the kernel's scratch ref arguments), so
the bytes reported by `decoder_memory()` are the bytes the compiled
kernels actually request. tests/test_sizes.py pins hand-computed golden
values and the fits-under-the-compiler-limit invariant.

The reference's own documented formulas (src/codes/mod.rs:91-105,
rendered as tables at src/lib.rs:146-200) remain available as
CodeParams.decode_bf_working_len / decode_ms_working_len / output_len;
`format_reference_table()` renders that exact documentation-parity table.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from .codes.expand import qc_structure
from .codes.params import ALL_CODES, LDPCCode, get_code

__all__ = [
    "DecoderMemory",
    "decoder_memory",
    "memory_table",
    "format_memory_table",
    "format_reference_table",
]

_F32 = jnp.dtype(jnp.float32)
_I32 = jnp.dtype(jnp.int32)


# ---------------------------------------------------------------------------
# Scratch spec functions — consumed by the kernel factories (pltpu.VMEM(*s))
# and by decoder_memory() below. Order matches the kernels' scratch refs.
# ---------------------------------------------------------------------------

def ms_flooding_scratch_specs(sumA, R, V, M, B, dtype, node_major):
    """Scratch of the fused flooding min-sum kernel: var->check messages,
    per-row min1/min2 stats, i32 sign-product bits, posteriors, i32 frozen
    bits, done, iters. node_major=True is the transposed TC layout (nodes
    on sublanes, batch on lanes — ops/pallas_tc.py)."""
    if node_major:
        return [
            ((sumA * M, B), dtype),
            ((R * M, B), dtype),
            ((R * M, B), dtype),
            ((R * M, B), _I32),
            ((V, B), dtype),
            ((V, B), _I32),
            ((1, B), _F32),
            ((1, B), _I32),
        ]
    return [
        ((sumA, B, M), dtype),
        ((R, B, M), dtype),
        ((R, B, M), dtype),
        ((R, B, M), _I32),
        ((B, V), dtype),
        ((B, V), _I32),
        ((B, 1), _F32),
        ((B, 1), _I32),
    ]


def ms_layered_scratch_specs(sumA, V, M, B, dtype, node_major,
                             recompute_u=False, n_layers=None):
    """Scratch of the fused row-layered min-sum kernel: check->var messages
    u (or, with `recompute_u`, 3 per-layer stat planes m1/m2/sg in its
    place — lane-major only), previous extrinsics t', carried posteriors,
    i32 frozen bits, done, iters."""
    if node_major:
        assert not recompute_u, "recompute_u is a lane-major kernel variant"
        return [
            ((sumA * M, B), dtype),
            ((sumA * M, B), dtype),
            ((V, B), dtype),
            ((V, B), _I32),
            ((1, B), _F32),
            ((1, B), _I32),
        ]
    first = (3 * n_layers, B, M) if recompute_u else (sumA, B, M)
    return [
        (first, dtype),
        ((sumA, B, M), dtype),
        ((B, V), dtype),
        ((B, V), _I32),
        ((B, 1), _F32),
        ((B, 1), _I32),
    ]


def sp_layered_scratch_specs(sumA, V, M, B):
    """Scratch of the fused layered SUM-PRODUCT kernel
    (ops/pallas_sp.py): check->var messages u, carried posteriors, i32
    frozen bits, done, iters — one (sumA, B, M) plane LIGHTER than the
    min-sum layered kernel (no t' plane: BP has no self-correction).
    Lane-major only."""
    return [
        ((sumA, B, M), _F32),
        ((B, V), _F32),
        ((B, V), _I32),
        ((B, 1), _F32),
        ((B, 1), _I32),
    ]


def bf_scratch_specs(V, B, node_major):
    """Scratch of the fused bit-flip kernel: working bits, violation
    counts, done, iters (all-f32 state)."""
    if node_major:
        return [((V, B), _F32), ((V, B), _F32), ((1, B), _F32), ((1, B), _I32)]
    return [((B, V), _F32), ((B, V), _F32), ((B, 1), _F32), ((B, 1), _I32)]


def _spec_bytes(specs) -> int:
    total = 0
    for shape, dt in specs:
        count = 1
        for d in shape:
            count *= d
        total += count * jnp.dtype(dt).itemsize
    return total


# ---------------------------------------------------------------------------
# Public table API
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class DecoderMemory:
    """Memory footprint of one (code, impl, dtype) Pallas decoder config.

    vmem_scratch_bytes is per GRID-STEP TILE (batch_tile codewords) and is
    exactly what the kernel's scratch_shapes request; vmem_io_bytes is the
    in+out VMEM blocks of one tile (Pallas double-buffers these across
    grid steps, so the compiler sees ~2x). hbm_bytes_per_cw is total HBM
    traffic per codeword per decode call — iteration-independent for these
    fused kernels (module docstring)."""

    code: str
    impl: str
    dtype: str
    storage_dtype: str  # int8/int16 run saturating semantics in f32 storage
    batch_tile: int
    vmem_scratch_bytes: int
    vmem_io_bytes: int
    state_bytes_per_cw: float
    hbm_bytes_per_cw: int

    @property
    def vmem_total_bytes(self) -> int:
        """Scratch + double-buffered io blocks: the kernel's VMEM ask."""
        return self.vmem_scratch_bytes + 2 * self.vmem_io_bytes


def _storage_dtype(dtype) -> jnp.dtype:
    d = jnp.dtype(dtype)
    if d in (jnp.dtype(jnp.int8), jnp.dtype(jnp.int16)):
        return _F32  # saturating int semantics as exact f32 clips
    return d


def decoder_memory(
    code: LDPCCode | str,
    impl: str = "pallas_layered",
    dtype=jnp.float32,
    batch_tile: int | None = None,
) -> DecoderMemory:
    """Memory footprint of one fused-kernel decoder configuration.

    impl: 'pallas_qc' (flooding), 'pallas_layered', or 'pallas_bf'.
    The default batch_tile is the measured per-code production tile
    (ops/routing.py ROUTES).
    """
    code = get_code(code)
    p = code.params
    s = qc_structure(code)
    M, R, Cc = s.m, s.n_block_rows, s.n_block_cols
    n, V = p.n, Cc * M
    sumA = sum(len(r) for r in s.rows)
    # the production layouts and tiles live in the explicit per-code
    # routing table (ops/routing.py)
    from .ops.routing import route_for

    route = route_for(code)
    if impl == "pallas_bf":
        node_major = route.bf_layout == "node_major"
    else:
        node_major = route.ms_layout == "node_major"
    in_dt = jnp.dtype(dtype) if impl != "pallas_bf" else _F32
    st = _storage_dtype(in_dt)

    if impl == "pallas_bf":
        if batch_tile is None:
            batch_tile = route.bf_batch_tile
        specs = bf_scratch_specs(V, batch_tile, node_major)
        # the bf kernels take hard bits as f32 planes over ALL V vars
        in_bytes = V * batch_tile * 4
    elif impl in ("pallas_qc", "pallas_layered"):
        if batch_tile is None:
            batch_tile = route.ms_batch_tile
        if impl == "pallas_qc":
            specs = ms_flooding_scratch_specs(
                sumA, R, V, M, batch_tile, st, node_major
            )
        else:
            specs = ms_layered_scratch_specs(sumA, V, M, batch_tile, st, node_major)
        in_bytes = n * batch_tile * st.itemsize
    else:
        raise ValueError(
            f"unknown impl {impl!r} (pallas_qc|pallas_layered|pallas_bf)"
        )

    out_bytes = batch_tile * (V + 4 + 4)  # u8 bits + f32 done + i32 iters
    scratch = _spec_bytes(specs)
    return DecoderMemory(
        code=code.name,
        impl=impl,
        dtype=jnp.dtype(dtype).name if impl != "pallas_bf" else "u8-bits",
        storage_dtype=st.name,
        batch_tile=batch_tile,
        vmem_scratch_bytes=scratch,
        vmem_io_bytes=in_bytes + out_bytes,
        state_bytes_per_cw=scratch / batch_tile,
        hbm_bytes_per_cw=(in_bytes + out_bytes) // batch_tile,
    )


def memory_table(
    codes=ALL_CODES,
    impls=("pallas_qc", "pallas_layered", "pallas_bf"),
    dtypes=(jnp.float32, jnp.bfloat16, jnp.int8),
) -> list[DecoderMemory]:
    rows = []
    for code in codes:
        for impl in impls:
            if impl == "pallas_bf":
                rows.append(decoder_memory(code, impl))
                continue
            for dt in dtypes:
                rows.append(decoder_memory(code, impl, dt))
    return rows


def _fmt_bytes(b: float) -> str:
    if b >= 1 << 20:
        return f"{b / (1 << 20):.1f} MiB"
    if b >= 1 << 10:
        return f"{b / (1 << 10):.1f} KiB"
    return f"{int(b)} B"


def format_memory_table(rows: list[DecoderMemory] | None = None) -> str:
    """Markdown table a user can size batches from (VERDICT r3 item 7)."""
    if rows is None:
        rows = memory_table()
    lines = [
        "| code | impl | LLR dtype | batch tile | VMEM scratch/tile "
        "| VMEM w/ io (2x buf) | state B/cw | HBM B/cw/decode |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r.code} | {r.impl} | {r.dtype}"
            f"{'' if r.dtype in (r.storage_dtype, 'u8-bits') else f' ({r.storage_dtype} storage)'}"
            f" | {r.batch_tile} | {_fmt_bytes(r.vmem_scratch_bytes)}"
            f" | {_fmt_bytes(r.vmem_total_bytes)}"
            f" | {r.state_bytes_per_cw:,.0f} | {r.hbm_bytes_per_cw:,} |"
        )
    return "\n".join(lines)


def format_reference_table() -> str:
    """The reference crate-docs RAM table (src/lib.rs:146-200 parity):
    per-code working-area and output sizes from the documented formulas
    (src/codes/mod.rs:91-105, kept as CodeParams properties)."""
    lines = [
        "| code | n | k | output bytes | bf working (u8) "
        "| ms working i8 | ms working f32 | ms working u8 |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for code in ALL_CODES:
        p = code.params
        w = p.decode_ms_working_len
        lines.append(
            f"| {code.name} | {p.n} | {p.k} | {p.output_len}"
            f" | {p.decode_bf_working_len} | {w} | {4 * w}"
            f" | {p.decode_ms_working_u8_len} |"
        )
    return "\n".join(lines)
