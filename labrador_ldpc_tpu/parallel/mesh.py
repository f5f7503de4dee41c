"""Data-parallel scaling over a device mesh.

The reference library is single-threaded; its only concurrency is the
perftest's rayon thread pool with an AtomicU64 counter merge
(perftest/src/main.rs:39-49). The TPU-native equivalent is pure data
parallelism over the codeword batch (SURVEY.md §5): a 1-D
`jax.sharding.Mesh` over all chips (multi-host included), the batch axis
sharded P('batch'), every compute stage embarrassingly parallel, and the
aggregate BER/FER counters reduced with XLA collectives over ICI/DCN (the
scalar sums below become psums under jit — the moral successor of the
AtomicU64).

No tensor/pipeline/sequence parallelism is warranted: a codeword is at most
10,240 LLRs, so the scaling dimension is the batch only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..codes.params import LDPCCode, get_code
from ..channel.awgn import ChannelStats
from ..ops.encoder import encode_bits
from ..ops.qc_minsum import make_ms_decoder_qc

__all__ = ["make_batch_mesh", "batch_sharding", "make_sharded_decoder", "make_sharded_trial_step"]


def make_batch_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name 'batch'."""
    if devices is None:
        devices = jax.devices()
    return jax.make_mesh(
        (len(devices),),
        ("batch",),
        devices=devices,
        axis_types=(jax.sharding.AxisType.Auto,),
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("batch"))


def make_sharded_decoder(
    code: LDPCCode | str,
    mesh: Mesh,
    dtype=jnp.float32,
    maxiters: int = 20,
    alpha: float | None = None,
):
    """Batched min-sum decoder with the batch sharded over the mesh.

    Returns fn(llrs: (B, n)) -> MSResult with B divisible by mesh size.
    Each shard decodes independently; only the while_loop's global
    all-done predicate crosses chips (a tiny boolean all-reduce).
    """
    code = get_code(code)
    decoder = make_ms_decoder_qc(code, dtype, maxiters, alpha)
    in_s = NamedSharding(mesh, P("batch", None))

    def decode(llrs):
        llrs = jax.lax.with_sharding_constraint(llrs, in_s)
        return decoder(llrs)

    return jax.jit(decode, in_shardings=(in_s,))


def make_sharded_trial_step(
    code: LDPCCode | str,
    global_batch: int,
    mesh: Mesh,
    maxiters: int = 100,
    dtype=jnp.float32,
    alpha: float | None = None,
):
    """End-to-end sharded channel trial step.

    Returns fn(key, sigma) -> ChannelStats where the (global_batch, n)
    pipeline is sharded P('batch') across the mesh and the returned scalar
    counters are global psums. Requires the partitionable threefry PRNG
    (default in current JAX) so random generation shards without
    cross-device traffic.
    """
    code = get_code(code)
    p = code.params
    dtype = jnp.dtype(dtype)
    assert global_batch % mesh.devices.size == 0
    decoder = make_ms_decoder_qc(code, dtype, maxiters, alpha)
    data_s = NamedSharding(mesh, P("batch", None))

    def step(key, sigma) -> ChannelStats:
        kd, kn = jax.random.split(key)
        data_bits = jax.random.bernoulli(kd, 0.5, (global_batch, p.k)).astype(jnp.uint8)
        data_bits = jax.lax.with_sharding_constraint(data_bits, data_s)
        cw_bits = encode_bits(code, data_bits)
        tx = 1.0 - 2.0 * cw_bits.astype(jnp.float32)
        noise = jax.random.normal(kn, tx.shape, jnp.float32) * sigma
        llrs = jax.lax.with_sharding_constraint((tx + noise).astype(dtype), data_s)
        res = decoder(llrs)
        data_hat = res.bits[:, : p.k]
        bit_err = (data_hat != data_bits).sum(dtype=jnp.int32, axis=1)
        # scalar reductions over the sharded batch axis compile to psums
        return ChannelStats(
            trials=jnp.asarray(global_batch, jnp.int32),
            bit_errors=bit_err.sum(dtype=jnp.int32),
            frame_errors=(bit_err > 0).sum(dtype=jnp.int32),
            decode_failures=(~res.success).sum(dtype=jnp.int32),
            iterations=res.iterations.sum(dtype=jnp.int32),
        )

    return jax.jit(step)
