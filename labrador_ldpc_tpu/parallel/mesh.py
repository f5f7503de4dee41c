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
from ..channel.awgn import _make_decoder, make_trial_step, resolve_impl

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
    impl: str = "auto",
):
    """Batched min-sum decoder with the batch sharded over the mesh.

    Returns fn(llrs: (B, n)) -> MSResult with B divisible by mesh size.
    Each shard decodes independently; only the while_loop's global
    all-done predicate crosses chips (a tiny boolean all-reduce).
    `impl` selects the implementation (default "auto" = the measured-best
    production path, see channel.awgn.resolve_impl); int dtypes route to
    the saturating QC int path.
    """
    code = get_code(code)
    # resolve "auto" BEFORE the Pallas check: the shard_map decision must
    # see the concrete impl name (ADVICE r3 medium)
    impl = resolve_impl(code, jnp.dtype(dtype), impl)
    decoder = _make_decoder(code, jnp.dtype(dtype), maxiters, alpha, impl)
    if impl.startswith("pallas"):
        # pallas_call is opaque to the GSPMD partitioner (it would be
        # replicated, not sharded) — map it per device explicitly
        from ..channel.awgn import shard_map_decoder

        decoder = shard_map_decoder(decoder, mesh)
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
    impl: str = "auto",
    llr_scale: float | None = None,
):
    """End-to-end sharded channel trial step.

    Returns fn(key, sigma) -> ChannelStats where the (global_batch, n)
    pipeline is sharded P('batch') across the mesh and the returned scalar
    counters are global psums. Thin wrapper over channel.awgn's
    make_trial_step(mesh=...), which holds the single definition of the
    trial pipeline (so every impl/dtype/quantizer combination behaves
    identically sharded and unsharded).
    """
    return make_trial_step(
        get_code(code),
        global_batch,
        maxiters,
        jnp.dtype(dtype).name,
        alpha,
        impl,
        llr_scale,
        mesh,
    )
