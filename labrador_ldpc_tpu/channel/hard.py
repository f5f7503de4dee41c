"""Hard-decision channels for the bit-flip decoder surface.

The reference documents a BF-vs-MS tradeoff — "between one and two dB
worse ... but a few times quicker" (/root/reference/src/lib.rs:165-172,
src/decoder.rs:227-229) — but ships no statistical harness for it: its
perftest drives only `decode_ms` (perftest/src/main.rs:9-29). This module
gives `decode_bf` the same first-class statistical channel the soft
decoders have (VERDICT r4 item 2), so the claim is MEASURED here instead
of taken on faith (stored curves in benchmarks/results/waterfall_bf_*,
gap quantified in STATUS.md):

  * "bsc":  the canonical hard channel — every transmitted bit flips
    i.i.d. with probability p (the sweep variable; there is no dB axis).
    This statistically exercises the fused erasure pass on punctured TM
    codes with RANDOM error patterns, not just the deterministic 3-flip
    protocol (/root/reference/benches/decode.rs:52).
  * "perftest"/"ebn0" (AWGN hard-decision): the SAME physical channel the
    min-sum waterfall uses (awgn.py noise conventions), hard-sliced
    before decoding. Running bf and ms at identical sigma makes the
    BF-vs-MS gap a clean horizontal (dB) read between the two FER curves
    — the hard decision costs the usual ~2 dB of soft information on top
    of the algorithmic gap. (Equivalently this is a BSC with
    p = Q(1/sigma); the physical form is kept so the ms comparison needs
    no crossover mapping.)
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from ..codes.params import LDPCCode, get_code
from ..ops.bitflip import BFResult
from ..ops.encoder import encode_bits
from .awgn import ChannelStats, shard_map_decoder

__all__ = ["make_bf_trial_step", "make_ms_hard_trial_step", "resolve_bf_impl"]


def resolve_bf_impl(code, impl: str, backend: str | None = None) -> str:
    """Resolve impl="auto" for the bit-flip surface: the fused Pallas bf
    kernels on TPU (10-40x the XLA paths — results.jsonl decode_bf rows),
    the XLA QC roll implementation elsewhere (bit-exact to the kernels,
    tests/test_pallas_bf.py, so CI gates run it off-TPU)."""
    if impl != "auto":
        return impl
    if backend is None:
        backend = jax.default_backend()
    return "pallas" if backend == "tpu" else "qc"


def _make_bf_decoder(code, maxiters: int, impl: str):
    if impl == "pallas":
        from ..ops.pallas_bf import make_bf_decoder_pallas

        return make_bf_decoder_pallas(code, maxiters=maxiters)
    if impl == "qc":
        from ..ops.bitflip import make_bf_decoder_qc

        return make_bf_decoder_qc(code, maxiters=maxiters)
    if impl == "gather":
        from ..ops.bitflip import make_bf_decoder

        return make_bf_decoder(code, maxiters=maxiters)
    raise ValueError(f"unknown bf impl {impl!r} (auto|pallas|qc|gather)")


def _hard_channel_rx(channel, kn, cw_bits, param):
    """Received HARD bits for the hard-surface channels (shared by the bf
    and ms_hard trial steps — round-5 review dedup): 'bsc' flips each bit
    i.i.d. w.p. param; 'bec' erases-to-0 i.i.d. w.p. param (the
    reference's residual-erasure convention, decoder.rs:167 — an erased
    true-1 bit is an error for the decoder to fix); 'perftest'/'ebn0'
    add AWGN at sigma=param on BPSK +-1 and hard-slice — the exact
    channel the soft ms waterfall uses, minus the soft information."""
    if channel == "bsc":
        flips = jax.random.bernoulli(kn, param, cw_bits.shape)
        return cw_bits ^ flips.astype(jnp.uint8)
    if channel == "bec":
        er = jax.random.bernoulli(kn, param, cw_bits.shape)
        return cw_bits * (1 - er.astype(jnp.uint8))
    tx = 1.0 - 2.0 * cw_bits.astype(jnp.float32)
    soft = tx + jax.random.normal(kn, tx.shape, jnp.float32) * param
    return (soft < 0).astype(jnp.uint8)


def _count_stats(batch, k, data_bits, res) -> ChannelStats:
    """Data-bit/frame error counters from a decode result (scalar
    reductions over a sharded batch axis compile to psums)."""
    data_hat = res.bits[:, :k]
    bit_err = (data_hat != data_bits).sum(dtype=jnp.int32, axis=1)  # (B,)
    return ChannelStats(
        trials=jnp.asarray(batch, jnp.int32),
        bit_errors=bit_err.sum(dtype=jnp.int32),
        frame_errors=(bit_err > 0).sum(dtype=jnp.int32),
        decode_failures=(~res.success).sum(dtype=jnp.int32),
        iterations=res.iterations.sum(dtype=jnp.int32),
    )


@lru_cache(maxsize=None)
def make_bf_trial_step(
    code: LDPCCode | str,
    batch: int,
    maxiters: int = 50,
    channel: str = "bsc",
    impl: str = "auto",
    mesh=None,
):
    """Build a jitted end-to-end hard-decision trial step.

    Returns fn(key, param) -> ChannelStats running `batch` codewords:
    random data -> encode -> hard channel -> decode_bf -> counters.
    `param` is the flip probability p for channel="bsc", or the noise
    sigma (from awgn.noise_sigma) for the AWGN hard-decision channels
    ("perftest"/"ebn0" — identical step; the model only determines how
    the caller maps dB to sigma).

    Mesh semantics match awgn.make_trial_step: `batch` is the GLOBAL
    batch, everything is sharded P('batch'), counters psum.
    """
    code = get_code(code)
    p = code.params
    if channel not in ("bsc", "bec", "perftest", "ebn0"):
        raise ValueError(
            f"unknown hard channel {channel!r} (bsc|bec|perftest|ebn0)"
        )
    impl = resolve_bf_impl(code, impl)
    decoder = _make_bf_decoder(code, maxiters, impl)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        assert batch % mesh.devices.size == 0, (batch, mesh.devices.size)
        data_s = NamedSharding(mesh, P("batch", None))
        if impl == "pallas":
            # opaque to the GSPMD partitioner — map explicitly per device
            decoder = shard_map_decoder(decoder, mesh, result_type=BFResult)

    def step(key: jax.Array, param: jnp.ndarray) -> ChannelStats:
        kd, kn = jax.random.split(key)
        data_bits = jax.random.bernoulli(kd, 0.5, (batch, p.k)).astype(jnp.uint8)
        if mesh is not None:
            data_bits = jax.lax.with_sharding_constraint(data_bits, data_s)
        cw_bits = encode_bits(code, data_bits)  # (B, n)
        rx = _hard_channel_rx(channel, kn, cw_bits, param)
        if mesh is not None:
            rx = jax.lax.with_sharding_constraint(rx, data_s)
        return _count_stats(batch, p.k, data_bits, decoder(rx))

    return jax.jit(step)


@lru_cache(maxsize=None)
def make_ms_hard_trial_step(
    code: LDPCCode | str,
    batch: int,
    maxiters: int = 50,
    channel: str = "bsc",
    impl: str = "auto",
    mesh=None,
):
    """Min-sum driven by HARD channel output (+-1 LLRs after slicing).

    This is the decode_ms side of the reference's own BF-vs-MS framing —
    both decoders consuming the same hard-decision bits
    (src/lib.rs:160-172 presents them as alternatives over `hard_to_llrs`
    input) — so (bf curve) - (this curve) at matched channel is the
    ALGORITHMIC gap the reference quotes as "one to two dB", with the
    soft-information loss (~2 dB, this curve vs the soft ms waterfall)
    separated out. Same channel/param conventions as make_bf_trial_step.
    """
    from .awgn import _make_decoder, resolve_impl

    code = get_code(code)
    p = code.params
    if channel not in ("bsc", "perftest", "ebn0"):
        raise ValueError(f"unknown hard channel {channel!r} (bsc|perftest|ebn0)")
    impl = resolve_impl(code, jnp.float32, impl)
    decoder = _make_decoder(code, jnp.float32, maxiters, None, impl)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        assert batch % mesh.devices.size == 0, (batch, mesh.devices.size)
        data_s = NamedSharding(mesh, P("batch", None))
        from .awgn import uses_pallas

        if uses_pallas(impl):
            decoder = shard_map_decoder(decoder, mesh)

    def step(key: jax.Array, param: jnp.ndarray) -> ChannelStats:
        kd, kn = jax.random.split(key)
        data_bits = jax.random.bernoulli(kd, 0.5, (batch, p.k)).astype(jnp.uint8)
        if mesh is not None:
            data_bits = jax.lax.with_sharding_constraint(data_bits, data_s)
        cw_bits = encode_bits(code, data_bits)
        rx = _hard_channel_rx(channel, kn, cw_bits, param)
        # hard_to_llrs convention: bit 1 -> -1, bit 0 -> +1 (decoder.rs:488)
        llrs = 1.0 - 2.0 * rx.astype(jnp.float32)
        if mesh is not None:
            llrs = jax.lax.with_sharding_constraint(llrs, data_s)
        return _count_stats(batch, p.k, data_bits, decoder(llrs))

    return jax.jit(step)
