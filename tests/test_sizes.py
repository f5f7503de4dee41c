"""Memory/size table validation (sizes.py — the src/lib.rs:146-200 analog).

The Pallas kernel factories build their pltpu.VMEM scratch lists from
sizes.py's *_scratch_specs functions (single source of truth), so these
tests pin the TABLE side: hand-computed golden values for flagship
configs, structural invariants (everything fits the kernels' 100 MiB
vmem_limit_bytes with double-buffered io), and agreement between the
spec functions and the reference's documented working-size formulas
where they describe the same object.
"""

import jax.numpy as jnp
import pytest

from labrador_ldpc_tpu.codes.expand import qc_structure
from labrador_ldpc_tpu.codes.params import ALL_CODES, get_code
from labrador_ldpc_tpu.sizes import (
    decoder_memory,
    format_memory_table,
    format_reference_table,
    memory_table,
)

VMEM_LIMIT = 100 * 1024 * 1024  # the kernels' compiler_params vmem ask


def test_tm8192_layered_golden():
    """Hand computation, TM8192 layered f32, tile 64 (docstring numbers):
    sumA=15 addends, R=3 block rows, M=2048, V=5*2048=10240.
      u + t' messages: 2 * 15*64*2048 * 4 B   = 15,728,640
      posteriors dtype + frozen f32: 64*10240*(4+4) = 5,242,880
      done f32 + iters i32: 64*(4+4)           = 512
    """
    m = decoder_memory("TM8192", "pallas_layered", jnp.float32)
    assert m.batch_tile == 64
    assert m.vmem_scratch_bytes == 15_728_640 + 5_242_880 + 512
    # HBM/cw: 8192 LLR f32 + 10240 u8 bits + 4 done + 4 iters
    assert m.hbm_bytes_per_cw == 8192 * 4 + 10240 + 8


def test_tm8192_flooding_golden():
    """Flooding adds per-row stats but drops t':
      vs messages: 15*64*2048*4      = 7,864,320
      m1+m2 dtype + sg f32: 3 rows * 64*2048 * (4+4+4) = 4,718,592
      posteriors + frozen: 64*10240*8 = 5,242,880 ; done+iters 512
    """
    m = decoder_memory("TM8192", "pallas_qc", jnp.float32)
    s = qc_structure(get_code("TM8192"))
    assert (s.m, s.n_block_rows, sum(len(r) for r in s.rows)) == (2048, 3, 15)
    assert m.vmem_scratch_bytes == 7_864_320 + 4_718_592 + 5_242_880 + 512


def test_tc512_layered_golden():
    """Transposed TC layout: M=64, V=n=512, sumA=2048/64=32, tile 512.
    u + t': 2 * (32*64)*512 * 4 = 8,388,608; va+frozen: 512*512*8 =
    2,097,152; done+iters: 512*8 = 4,096."""
    m = decoder_memory("TC512", "pallas_layered", jnp.float32)
    assert m.batch_tile == 512
    assert m.vmem_scratch_bytes == 8_388_608 + 2_097_152 + 4_096


def test_bf_golden():
    """bf state is 2 (B, V) f32 planes + done/iters."""
    m = decoder_memory("TM8192", "pallas_bf")
    assert m.batch_tile == 128
    assert m.vmem_scratch_bytes == 2 * 128 * 10240 * 4 + 128 * 8
    # bf input enters as f32 planes over all V vars
    assert m.hbm_bytes_per_cw == 10240 * 4 + 10240 + 8


@pytest.mark.parametrize("row", memory_table(), ids=lambda r: f"{r.code}-{r.impl}-{r.dtype}")
def test_fits_vmem_limit(row):
    """Every production default tile must fit the kernels' compiler VMEM
    ask (scratch + double-buffered io blocks) with headroom for Mosaic's
    own unrolled temporaries (docs/DESIGN.md section 6)."""
    assert row.vmem_total_bytes < VMEM_LIMIT, row
    assert row.state_bytes_per_cw * row.batch_tile == row.vmem_scratch_bytes


def test_bf16_halves_message_planes():
    """bf16 storage halves exactly the dtype-typed planes (messages,
    posteriors), not the f32 frozen/stat planes."""
    f = decoder_memory("TM8192", "pallas_layered", jnp.float32)
    h = decoder_memory("TM8192", "pallas_layered", jnp.bfloat16)
    # u, t', va are dtype planes: (2*15 + 5) * 64*2048 * itemsize
    dtyped = (2 * 15 * 2048 + 10240) * 64
    assert f.vmem_scratch_bytes - h.vmem_scratch_bytes == dtyped * 2


def test_int_storage_is_f32():
    """int8/int16 run saturating semantics in f32 storage — identical
    footprint to f32 (pallas_qc.py module docstring)."""
    f = decoder_memory("TM2048", "pallas_layered", jnp.float32)
    i = decoder_memory("TM2048", "pallas_layered", jnp.int8)
    assert i.storage_dtype == "float32"
    assert i.vmem_scratch_bytes == f.vmem_scratch_bytes
    assert i.hbm_bytes_per_cw == f.hbm_bytes_per_cw


def test_reference_working_len_vs_structure():
    """The reference's decode_ms working-length formula
    (2|E| + 3n + 3p - 2k, src/codes/mod.rs:97-101) is exactly its
    decoder's working split u(|E|) + v(|E|) + va(n+p) + ui_min1(n+p-k) +
    ui_min2(n+p-k) (decoder.rs:375-379). Cross-check |E| and the
    var/check counts against the expanded QC structure for every code."""
    for code in ALL_CODES:
        p = code.params
        s = qc_structure(code)
        sumA = sum(len(r) for r in s.rows)
        assert sumA * s.m == p.paritycheck_sum  # |E|
        assert s.n_block_cols * s.m == p.n_vars
        assert s.n_block_rows * s.m == p.n_checks
        assert p.decode_ms_working_len == (
            2 * p.paritycheck_sum + p.n_vars + 2 * p.n_checks
        )


def test_tables_render():
    t = format_memory_table()
    assert "TM8192" in t and "pallas_layered" in t and "MiB" in t
    r = format_reference_table()
    assert "TC128" in r and "| 16 |" in r
    # one row per code x (2 ms impls x 3 dtypes + bf)
    assert len(t.strip().splitlines()) == 2 + 9 * 7
