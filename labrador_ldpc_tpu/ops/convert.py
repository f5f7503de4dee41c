"""Bit packing and hard/soft conversion ops (batched, jittable).

TPU-native counterparts of the reference's byte-oriented helpers:
  * hard_to_llrs (decoder.rs:484-493): bit 1 -> -1, bit 0 -> +1
  * llrs_to_hard (decoder.rs:498-509): sign -> MSB-first packed bits
plus MSB-first pack/unpack used throughout (the reference indexes bits as
`byte >> (7 - (bit % 8))`, i.e. MSB-first).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["unpack_bits", "pack_bits", "hard_to_llrs", "llrs_to_hard"]

# numpy (not jnp): module import must not initialize a JAX backend — the
# multi-host launcher configures devices after importing the package
_MSB_SHIFTS = np.arange(7, -1, -1, dtype=np.uint8)
_MSB_WEIGHTS = (1 << _MSB_SHIFTS).astype(np.uint8)


def unpack_bits(data: jnp.ndarray) -> jnp.ndarray:
    """(..., nbytes) uint8 -> (..., nbytes*8) uint8 bits, MSB-first."""
    data = jnp.asarray(data, dtype=jnp.uint8)
    bits = (data[..., :, None] >> _MSB_SHIFTS) & jnp.uint8(1)
    return bits.reshape(*data.shape[:-1], data.shape[-1] * 8)


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(..., n) bits (any integer/bool dtype) -> (..., n/8) uint8, MSB-first."""
    n = bits.shape[-1]
    assert n % 8 == 0, "bit count must be a multiple of 8"
    b = jnp.asarray(bits, dtype=jnp.uint8).reshape(*bits.shape[:-1], n // 8, 8)
    return (b * _MSB_WEIGHTS).sum(axis=-1).astype(jnp.uint8)


def hard_to_llrs(data: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(..., n/8) packed hard bytes -> (..., n) LLRs of +-1 in `dtype`."""
    bits = unpack_bits(data)
    one = jnp.ones((), dtype=dtype)
    return jnp.where(bits == 1, -one, one)


def llrs_to_hard(llrs: jnp.ndarray) -> jnp.ndarray:
    """(..., n) LLRs -> (..., n/8) packed hard bytes (negative -> bit 1)."""
    return pack_bits(llrs < 0)
