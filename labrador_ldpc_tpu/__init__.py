"""labrador_ldpc_tpu — a TPU-native CCSDS LDPC codec framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
`labrador-ldpc` Rust crate (CCSDS 231.1-O-1 TC and CCSDS 131.0-B-2 TM LDPC
codes): batched systematic encoding on the MXU, batched soft (self-corrected
min-sum / normalized min-sum) and hard (bit-flipping + erasure) decoding with
early termination, an end-to-end AWGN channel harness with BER/FER waterfall
sweeps, and data-parallel scaling over `jax.sharding` meshes with psum'd
statistics.

Quick start::

    import jax.numpy as jnp
    import labrador_ldpc_tpu as ldpc

    code = ldpc.LDPCCode.TM8192
    cw   = ldpc.encode(code, data_bytes)              # (B, k/8) -> (B, n/8)
    llrs = ldpc.hard_to_llrs(cw, jnp.float32)         # or soft demod output
    res  = ldpc.decode_ms(code, llrs, maxiters=20)    # batched min-sum
    data = ldpc.pack_bits(res.bits[:, :code.k])
"""

from .codes.params import ALL_CODES, TC_CODES, TM_CODES, CodeParams, LDPCCode, get_code
from .codes.expand import (
    decoder_tables,
    generator_parity_matrix,
    parity_check_matrix,
    parity_edges,
)
from .ops.convert import hard_to_llrs, llrs_to_hard, pack_bits, unpack_bits
from .ops.encoder import encode, encode_bits, encode_onto, make_encoder
from .ops.minsum import MSResult, decode_ms, make_ms_decoder
from .ops.qc_minsum import (
    make_ms_decoder_layered,
    make_ms_decoder_qc,
    make_ms_decoder_qc_i8,
    make_ms_decoder_qc_int,
)
from .ops.pallas_qc import make_ms_decoder_pallas_layered, make_ms_decoder_pallas_qc
from .ops.bitflip import (
    BFResult,
    decode_bf,
    decode_erasures_bits,
    decode_erasures_mask,
    make_bf_decoder,
    make_bf_decoder_qc,
)
from .ops.pallas_bf import make_bf_decoder_pallas
from .ops.pallas_sp import make_sp_decoder_pallas
from .ops.sumproduct import make_sp_decoder, make_sp_decoder_layered

__version__ = "0.1.0"

__all__ = [
    "LDPCCode", "CodeParams", "get_code", "ALL_CODES", "TC_CODES", "TM_CODES",
    "parity_edges", "parity_check_matrix", "generator_parity_matrix", "decoder_tables",
    "encode", "encode_bits", "encode_onto", "make_encoder",
    "decode_ms", "make_ms_decoder", "make_ms_decoder_qc", "make_ms_decoder_qc_i8",
    "make_ms_decoder_qc_int", "make_ms_decoder_layered", "make_ms_decoder_pallas_qc",
    "make_ms_decoder_pallas_layered", "MSResult",
    "decode_bf", "make_bf_decoder", "make_bf_decoder_qc", "make_bf_decoder_pallas",
    "decode_erasures_mask",
    "make_sp_decoder", "make_sp_decoder_layered", "make_sp_decoder_pallas",
    "BFResult", "decode_erasures_bits",
    "hard_to_llrs", "llrs_to_hard", "pack_bits", "unpack_bits",
    "__version__",
]
