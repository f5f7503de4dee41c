"""Batched GF(2) systematic encoder.

The reference encodes one codeword at a time with a bit-serial
XOR-and-rotate loop over the compact circulant generator
(encoder.rs:190-252). On TPU the entire loop collapses into ONE batched
int8 matmul on the MXU against the expanded generator parity block:

    parity_bits = (data_bits @ G_parity) mod 2        # (B,k) @ (k,n-k)

G_parity is expanded once at trace time (codes/expand.py) and lives in HBM
as an int8 constant; XLA tiles the matmul onto the MXU with int32
accumulation, and the mod-2 is a fused elementwise epilogue.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..codes.expand import generator_parity_matrix
from ..codes.params import LDPCCode, get_code
from .convert import pack_bits, unpack_bits

__all__ = ["encode_bits", "encode", "encode_onto", "make_encoder"]


@lru_cache(maxsize=None)
def _g_parity_i8(code: LDPCCode) -> np.ndarray:
    # cached as host numpy: converting inside a jit trace would cache a
    # tracer (leak); jnp.asarray at the use site stages it as a constant.
    return np.asarray(generator_parity_matrix(code), dtype=np.int8)


def encode_bits(code: LDPCCode | str, data_bits: jnp.ndarray) -> jnp.ndarray:
    """(B, k) data bits -> (B, n) codeword bits (systematic), uint8."""
    code = get_code(code)
    with jax.named_scope("gf2_encode_mxu"):
        g = jnp.asarray(_g_parity_i8(code))
        x = jnp.asarray(data_bits, dtype=jnp.int8)
        parity = jnp.dot(x, g, preferred_element_type=jnp.int32) & 1
        return jnp.concatenate(
            [data_bits.astype(jnp.uint8), parity.astype(jnp.uint8)], axis=-1
        )


def encode(code: LDPCCode | str, data_bytes: jnp.ndarray) -> jnp.ndarray:
    """(B, k/8) packed data bytes -> (B, n/8) packed codeword bytes.

    Equivalent to the reference's `copy_encode` (encoder.rs:309-315) over a
    batch of codewords.
    """
    code = get_code(code)
    bits = unpack_bits(data_bytes)
    return pack_bits(encode_bits(code, bits))


def encode_onto(code: LDPCCode | str, codeword_bytes: jnp.ndarray) -> jnp.ndarray:
    """Encode reading the data already sitting in the codeword head.

    The functional counterpart of the reference's in-place
    `encode(&mut codeword)` (encoder.rs:293-307), which computes the parity
    tail from the first k bits of the caller's n-bit codeword buffer. JAX
    arrays are immutable, so "in place" becomes value semantics: the input
    is a (B, n/8) packed buffer whose head holds the data (tail contents
    ignored) and the result is the same-shape buffer with the parity tail
    filled in. (Callers that need true in-place reuse can jit with
    donate_argnums on the buffer; this function does not donate by
    itself.)
    """
    code = get_code(code)
    p = code.params
    assert codeword_bytes.shape[-1] == p.n // 8, (
        f"codeword buffer must be (B, {p.n // 8}) packed bytes"
    )
    # last-axis slice: encode/pack_bits are last-axis ops, so a single
    # unbatched (n/8,) buffer works too (the reference's in-place encode
    # takes one codeword, encoder.rs:293)
    return encode(code, codeword_bytes[..., : p.k // 8])


@lru_cache(maxsize=None)
def make_encoder(code: LDPCCode | str, packed: bool = True):
    """Return a jitted batched encoder for `code`.

    packed=True:  (B, k/8) uint8 -> (B, n/8) uint8
    packed=False: (B, k) bits    -> (B, n) bits
    """
    code = get_code(code)
    fn = encode if packed else encode_bits
    return jax.jit(partial(fn, code))
