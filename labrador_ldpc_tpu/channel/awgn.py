"""Channel simulation: modulation, AWGN, soft demodulation.

TPU-native counterpart of the reference perftest's trial generator
(perftest/src/main.rs:9-29): random data -> encode -> +-1 LLR mapping ->
Gaussian noise on the LLRs -> min-sum decode -> error counting, but batched
and jit-compiled end to end with `jax.random`.

Two noise models:
  * "perftest": the reference's exact convention — noise sigma = 10^(-snr/10)
    added directly to +-1 LLRs (NOT a physical Es/N0; the LLRs are not
    2y/sigma^2 scaled, which is valid because min-sum is scale-invariant,
    decoder.rs:332-335). Use this to reproduce the reference waterfall
    curves point for point.
  * "ebn0": physical BPSK over AWGN at Eb/N0 dB — sigma^2 = 1/(2 R 10^(x/10))
    with R = k/n; LLRs again left unscaled (scale invariance).
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..codes.params import LDPCCode, get_code
from ..ops.encoder import encode_bits
from ..ops.minsum import MSResult, make_ms_decoder


_INT_DTYPES = ("int8", "int16")


def resolve_impl(code, dtype, impl: str, backend: str | None = None) -> str:
    """Resolve impl="auto" to a concrete implementation name.

    The measured-best production schedule per code/backend (results.jsonl
    decode_ms/ms_iter rows): on TPU the fused Pallas LAYERED kernels for
    every code — the round-4 quartered node-major kernels removed the one
    exception (TM1280's masked-roll syndrome penalty: node-major layered
    4.25M cw/s now beats both its own flooding 3.88M and the old
    lane-major best 2.07M). Off-TPU (or f64/int32, which Mosaic doesn't
    take) the XLA layered path, falling back to reference-order for
    int32. `backend` defaults to `jax.default_backend()` and exists so
    tests can pin the TPU routing table off-TPU.

    Concrete impl names pass through unchanged, so callers (make_trial_step,
    decode_ms) can resolve ONCE and key caches / shard_map decisions on the
    concrete name — a pallas_call is opaque to the GSPMD partitioner, so
    "is this a Pallas impl" must be asked about the RESOLVED impl, never
    the literal string "auto" (ADVICE r3 medium).

    (The round-3 bf16 guidance for TM1280/TM1536 is retired: it described
    the lane-major masked-roll kernels, which were data-motion-bound; the
    node-major quartered kernels are faster in f32 — measured f32 4.25M /
    3.67M vs bf16 3.89M / 3.30M cw/s.)
    """
    if impl != "auto":
        return impl
    dtype = jnp.dtype(dtype)
    if backend is None:
        backend = jax.default_backend()
    if backend == "tpu" and dtype.name in ("float32", "bfloat16", "int8", "int16"):
        return "pallas_layered"
    if dtype.name == "int32":
        return "ref"
    return "layered"


def uses_pallas(impl: str) -> bool:
    """Whether the RESOLVED impl builds an opaque `pallas_call` — which
    the GSPMD partitioner would REPLICATE on every device of a mesh, so
    it must be wrapped in shard_map explicitly (ADVICE r3 medium; the
    round-5 review caught the sp impls missing from the old
    startswith("pallas") predicate, which would have silently defeated
    multichip scaling for the SP quality path)."""
    if impl.startswith("pallas") or impl == "sp_pallas":
        return True
    # sp_layered serves the fused kernel on TPU, the XLA twin elsewhere
    return impl == "sp_layered" and jax.default_backend() == "tpu"


def _make_decoder(code, dtype, maxiters, alpha, impl: str):
    """Select the min-sum implementation: "auto" (measured-best production
    path for the build-time backend — see `resolve_impl`), "ref"
    (reference-order XLA),
    "qc" (roll-based XLA; int dtypes route to the saturating QC int path),
    "layered" (row-layered schedule), "qc_i8"/"qc_i16" (explicit saturating
    QC int paths), or "pallas_qc"/"pallas_layered" (VMEM-resident fused
    kernels, all 9 codes — TM via lane rolls, TC via the transposed
    sublane-roll kernels — the fastest paths on real TPU hardware;
    int8/int16 run the saturating semantics via exact f32 clips).

    Dtype guidance (measured; ops/routing.py carries the per-code tile
    sweeps): f32 is the production dtype for every code — the round-4
    node-major parts kernels retired the earlier "bf16 for TM1280/TM1536"
    exception (f32 4.25M/3.67M vs bf16 3.89M/3.30M cw/s); bf16 loses
    8-24% on the issue-bound lane-major kernels too. int8/int16 run
    saturating semantics for quantized-LLR front ends (flooding:
    reference-exact; layered: wide-accumulator redesign, see
    make_ms_decoder_layered).

    Raises ValueError with an explicit message on unsupported dtype/impl
    combinations instead of failing deep inside the decoder builders.
    """
    dtype = jnp.dtype(dtype)
    is_int = dtype.name in ("int8", "int16", "int32")
    impl = resolve_impl(code, dtype, impl)
    if impl == "ref":
        return make_ms_decoder(code, dtype, maxiters, alpha)
    if impl in ("qc", "qc_i8", "qc_i16"):
        if impl == "qc_i8" and dtype.name != "int8":
            raise ValueError(f"impl 'qc_i8' requires dtype int8, got {dtype.name}")
        if impl == "qc_i16" and dtype.name != "int16":
            raise ValueError(f"impl 'qc_i16' requires dtype int16, got {dtype.name}")
        if is_int:
            if dtype.name == "int32":
                raise ValueError(
                    "QC int path supports int8/int16; use impl='ref' for int32"
                )
            if alpha is not None:
                raise ValueError("the saturating QC int path does not support alpha")
            from ..ops.qc_minsum import make_ms_decoder_qc_int

            return make_ms_decoder_qc_int(code, dtype, maxiters)
        if impl != "qc":
            raise ValueError(f"impl {impl!r} requires an int dtype, got {dtype.name}")
        from ..ops.qc_minsum import make_ms_decoder_qc

        return make_ms_decoder_qc(code, dtype, maxiters, alpha)
    if impl == "layered":
        if dtype.name == "int32":
            raise ValueError(
                "layered decoder supports float32/bfloat16/float64/int8/int16; "
                "use impl='ref' for int32"
            )
        if is_int and alpha is not None:
            raise ValueError("the saturating int layered path does not support alpha")
        from ..ops.qc_minsum import make_ms_decoder_layered

        return make_ms_decoder_layered(code, dtype, maxiters, alpha)
    if impl in ("pallas_qc", "pallas_layered"):
        if dtype.name == "int32":
            raise ValueError(
                f"{impl} supports float32/bfloat16/int8/int16; use impl='ref' "
                "for int32"
            )
        if is_int and alpha is not None:
            raise ValueError("the saturating int path does not support alpha")
        if impl == "pallas_qc":
            from ..ops.pallas_qc import make_ms_decoder_pallas_qc

            return make_ms_decoder_pallas_qc(code, dtype, maxiters, alpha)
        from ..ops.pallas_qc import make_ms_decoder_pallas_layered

        return make_ms_decoder_pallas_layered(code, dtype, maxiters, alpha)
    if impl in ("sp", "sp_layered", "sp_pallas"):
        # sum-product surfaces (f32 only; TRUE channel LLRs — the trial
        # step scales by 2/sigma^2 for these impls, BP is not
        # scale-invariant unlike min-sum, decoder.rs:332-335):
        #   "sp"         flooding BP — the validation yardstick the
        #                reference cites but never instantiates
        #                (src/lib.rs:217-218)
        #   "sp_layered" the QUALITY path: layered BP — fused Pallas
        #                kernel on TPU (55k cw/s TM8192@1.1, 37x the
        #                XLA flooding form, same 12/4096-FE quality),
        #                XLA layered twin elsewhere
        #   "sp_pallas"  force the fused kernel explicitly
        if dtype.name != "float32":
            raise ValueError(f"impl {impl!r} supports float32 only")
        if alpha is not None:
            raise ValueError(f"impl {impl!r} does not take alpha")
        if impl == "sp":
            from ..ops.sumproduct import make_sp_decoder

            return make_sp_decoder(code, maxiters)
        if impl == "sp_pallas" or jax.default_backend() == "tpu":
            from ..ops.pallas_sp import make_sp_decoder_pallas

            return make_sp_decoder_pallas(code, maxiters)
        from ..ops.sumproduct import make_sp_decoder_layered

        return make_sp_decoder_layered(code, maxiters)
    raise ValueError(
        f"unknown decoder impl {impl!r} "
        "(auto|ref|qc|layered|qc_i8|qc_i16|pallas_qc|pallas_layered|"
        "sp|sp_layered|sp_pallas)"
    )


def shard_map_decoder(decoder, mesh, result_type=MSResult):
    """Map a batched decoder over a 1-D 'batch' mesh with jax.shard_map.

    The XLA decoder implementations partition under plain
    `with_sharding_constraint` (GSPMD propagates the batch sharding through
    every op), but a `pallas_call` is an opaque custom call to the
    partitioner and would be REPLICATED on every device instead of sharded.
    shard_map makes the data parallelism explicit: each device runs the
    kernel on its local batch shard (including its own early-exit
    while_loop — no cross-chip all-done sync), and the per-shard results
    concatenate along the batch axis.

    `result_type` is the decoder's result NamedTuple — MSResult (default)
    or ops.bitflip.BFResult; both carry (success, iterations, bits).
    """
    from jax.sharding import PartitionSpec as P

    out_specs = result_type(
        success=P("batch"), iterations=P("batch"), bits=P("batch", None)
    )
    # check_vma=False: pallas_call's out_shape ShapeDtypeStructs carry no
    # varying-across-mesh annotations, which the vma checker requires
    return jax.shard_map(
        decoder,
        mesh=mesh,
        in_specs=(P("batch", None),),
        out_specs=out_specs,
        check_vma=False,
    )


__all__ = [
    "ChannelStats",
    "default_llr_scale",
    "make_trial_step",
    "make_two_stage_decoder",
    "noise_sigma",
    "quantize_llrs",
    "resolve_impl",
    "uses_pallas",
]


class ChannelStats(NamedTuple):
    trials: jnp.ndarray  # () int64-ish — codewords attempted
    bit_errors: jnp.ndarray  # () — data-bit errors after decoding
    frame_errors: jnp.ndarray  # () — codewords with any data-bit error
    decode_failures: jnp.ndarray  # () — decoder reported non-convergence
    iterations: jnp.ndarray  # () — total decoder iterations run


def noise_sigma(snr_db: float, code: LDPCCode | None = None, model: str = "perftest") -> float:
    if model == "perftest":
        # perftest/src/main.rs:15 — sigma = 10^(-snr/10)
        return float(10.0 ** (-snr_db / 10.0))
    if model == "ebn0":
        assert code is not None
        rate = code.k / code.n
        return float((2.0 * rate * 10.0 ** (snr_db / 10.0)) ** -0.5)
    raise ValueError(f"unknown noise model {model!r}")


def default_llr_scale(dtype) -> float:
    """Default quantizer scale for integer LLR dtypes.

    The ±1-signal channel LLRs are multiplied by this before round+clip.
    16 for int8 puts the signal at ±16 with ~1/16-signal resolution and
    ~±127/16 ≈ 8-sigma clipping headroom at waterfall-region noise levels
    (sigma ≈ 0.6–0.9); 256 for int16 scales the same shape up. Min-sum is
    scale-invariant (decoder.rs:332-335), so only quantization/clipping
    noise — not the scale itself — affects BER.
    """
    d = jnp.dtype(dtype)
    if d == jnp.dtype(jnp.int8):
        return 16.0
    if d == jnp.dtype(jnp.int16):
        return 256.0
    raise ValueError(f"no default LLR scale for dtype {d.name}")


def quantize_llrs(llrs: jnp.ndarray, dtype, scale: float | None = None) -> jnp.ndarray:
    """Quantize float channel LLRs to an integer dtype: clip(round(llr*scale)).

    The reference treats integer LLRs as first-class decode inputs
    (decoder.rs:42-55, saturating DecodeFrom); this is the channel-side
    quantizer that makes int decoding meaningful on soft AWGN outputs —
    a bare astype() would truncate ±1±noise to {-1, 0, 1} and destroy most
    of the soft information.
    """
    d = jnp.dtype(dtype)
    if scale is None:
        scale = default_llr_scale(d)
    info = jnp.iinfo(d)
    return jnp.clip(jnp.round(llrs * scale), info.min, info.max).astype(d)


@lru_cache(maxsize=None)
def make_trial_step(
    code: LDPCCode | str,
    batch: int,
    maxiters: int = 100,
    dtype_name: str = "float32",
    alpha: float | None = None,
    impl: str = "auto",
    llr_scale: float | None = None,
    mesh=None,
):
    """Build a jitted end-to-end trial step.

    Returns fn(key, sigma) -> ChannelStats running `batch` codewords:
    random data -> encode -> BPSK +-1 -> AWGN(sigma) -> min-sum -> counters.
    Integer dtypes are quantized with `quantize_llrs` (scale `llr_scale`,
    default `default_llr_scale(dtype)`); float dtypes keep the reference's
    unscaled-LLR convention.

    With `mesh` (a 1-D 'batch' jax.sharding.Mesh), `batch` is the GLOBAL
    batch: the whole pipeline is sharded P('batch') across the mesh and the
    returned scalar counters compile to psums — the TPU-native successor of
    the perftest's AtomicU64 merge (perftest/src/main.rs:42-49). Requires
    the partitionable threefry PRNG (JAX default) so random generation
    shards without cross-device traffic.
    """
    code = get_code(code)
    p = code.params
    dtype = jnp.dtype(dtype_name)
    is_int = dtype.name in _INT_DTYPES
    # resolve "auto" to its concrete name FIRST: the shard_map decision
    # below must see the real impl (auto resolves to a Pallas kernel on
    # TPU, and an un-shard_mapped pallas_call would run replicated on
    # every device of the mesh — ADVICE r3 medium)
    impl = resolve_impl(code, dtype, impl)
    decoder = _make_decoder(code, dtype, maxiters, alpha, impl)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        assert batch % mesh.devices.size == 0, (batch, mesh.devices.size)
        data_s = NamedSharding(mesh, P("batch", None))
        if uses_pallas(impl):
            # opaque to the GSPMD partitioner — map explicitly per device
            decoder = shard_map_decoder(decoder, mesh)

    def step(key: jax.Array, sigma: jnp.ndarray) -> ChannelStats:
        kd, kn = jax.random.split(key)
        data_bits = jax.random.bernoulli(kd, 0.5, (batch, p.k)).astype(jnp.uint8)
        if mesh is not None:
            data_bits = jax.lax.with_sharding_constraint(data_bits, data_s)
        cw_bits = encode_bits(code, data_bits)  # (B, n)
        # bit 1 -> -1, bit 0 -> +1 (hard_to_llrs convention, decoder.rs:488-492)
        tx = 1.0 - 2.0 * cw_bits.astype(jnp.float32)
        noise = jax.random.normal(kn, tx.shape, jnp.float32) * sigma
        soft = tx + noise
        if is_int:
            llrs = quantize_llrs(soft, dtype, llr_scale)
        elif impl.startswith("sp"):
            # true channel LLRs 2y/sigma^2: sum-product is NOT
            # scale-invariant (min-sum is, decoder.rs:332-335, which is
            # why the perftest's unscaled-LLR convention works there)
            llrs = (soft * (2.0 / (sigma * sigma))).astype(dtype)
        else:
            llrs = soft.astype(dtype)
        if mesh is not None:
            llrs = jax.lax.with_sharding_constraint(llrs, data_s)
        res = decoder(llrs)
        data_hat = res.bits[:, : p.k]
        bit_err = (data_hat != data_bits).sum(dtype=jnp.int32, axis=1)  # (B,)
        # scalar reductions over a sharded batch axis compile to psums
        return ChannelStats(
            trials=jnp.asarray(batch, jnp.int32),
            bit_errors=bit_err.sum(dtype=jnp.int32),
            frame_errors=(bit_err > 0).sum(dtype=jnp.int32),
            decode_failures=(~res.success).sum(dtype=jnp.int32),
            iterations=res.iterations.sum(dtype=jnp.int32),
        )

    return jax.jit(step)


def make_two_stage_decoder(
    code: LDPCCode | str,
    maxiters_fast: int = 25,
    maxiters_rescue: int = 100,
    dtype=jnp.bfloat16,
    rescue_dtype=jnp.float32,
    fast_impl: str = "layered",
    rescue_impl: str = "qc",
):
    """Production two-stage decode: layered fast pass + flooding rescue.

    The layered schedule converges in roughly half the iterations but can
    stall on a tiny fraction of near-threshold frames where the flooding
    self-corrected min-sum still converges. Stage 1 decodes everything with
    the layered decoder; stage 2 re-decodes ONLY the failed frames (host-side
    gather, so the rescue batch is tiny and its cost amortizes to
    failure_rate * batch). Returns fn(llrs: (B, n)) -> MSResult with
    combined results.

    `fast_impl`/`rescue_impl` select the stage decoders through the shared
    `_make_decoder` registry; on real TPU pair the fused kernels
    (fast_impl="pallas_layered", rescue_impl="pallas_layered" for
    bit-identical quality to a plain layered run at the rescue budget).

    MEASURED DOMINATED on TPU (results.jsonl `decode_threshold` rows,
    TM8192 B=16384): the plain pallas_layered kernel at maxiters=100 beats
    every two-stage pairing at BOTH the threshold point (49.0k vs 35.9k
    cw/s @1.1 dB, equal quality) and the sparse-straggler point (134.4k vs
    111.0k @1.5 dB) — the Pallas kernels' PER-TILE early-exiting
    while_loop already adapts the iteration budget at 64-codeword
    granularity, which is the entire benefit a two-stage design buys, and
    the host sync + rescue re-dispatch never pays for itself. Kept as a
    harness utility (useful off-TPU where the XLA decoders have no
    per-tile exit, and as the reference point for that claim).

    This is a host-orchestrated harness utility (two jit dispatches, data-
    dependent batch), not a jittable op.
    """
    code = get_code(code)
    fast = _make_decoder(code, jnp.dtype(dtype), maxiters_fast, None, fast_impl)
    rescue = _make_decoder(
        code, jnp.dtype(rescue_dtype), maxiters_rescue, None, rescue_impl
    )

    from ..ops.minsum import MSResult

    @jax.jit
    def _gather(llrs, idx):
        return jnp.take(llrs, idx, axis=0)

    @jax.jit
    def _combine(res, r2, idx):
        # idx is the pow2-padded failure list; the padding duplicates the
        # last failed frame, whose rescue rows are identical decodes of the
        # same input, so duplicate scatters are value-identical (set: last
        # wins; the iteration sum is computed per entry BEFORE the scatter,
        # never accumulated through it).
        #
        # Combined 0-based convergence iteration = fast-pass iterations
        # actually consumed (== res.iterations for failed frames: the
        # while_loop only stops early when EVERY frame converged, so a
        # failed frame always reports maxiters_fast — but read it from the
        # result rather than assuming, keeping the reference's
        # decoder.rs:347-351 "(success, iters)" contract exact) plus the
        # rescue pass's 0-based convergence iteration.
        return MSResult(
            success=res.success.at[idx].set(r2.success),
            iterations=res.iterations.at[idx].set(
                res.iterations[idx] + r2.iterations
            ),
            bits=res.bits.at[idx].set(r2.bits),
        )

    def decode(llrs):
        import numpy as np

        llrs = jnp.asarray(llrs)
        res = fast(llrs)
        # the ONLY device->host transfer: the (B,) success mask (a
        # necessary sync point of the host-orchestrated design). The
        # gather of failed frames, the rescue feed, and the
        # scatter-combine are jitted device programs (cached per pow2
        # failure bucket) — fetching LLRs/bits to the host, or issuing
        # eager scatter ops, costs a ~30-45 ms dispatch round trip EACH
        # through this environment's tunnel (measured 140x slowdown for
        # the fetch-everything version).
        success = np.asarray(res.success)
        if success.all():
            return res
        bad = np.nonzero(~success)[0]
        # pad the rescue batch to a power-of-two bucket to bound recompiles
        pad = 1 << max(3, int(np.ceil(np.log2(len(bad)))))
        idx = jnp.asarray(np.pad(bad, (0, pad - len(bad)), mode="edge"))
        r2 = rescue(_gather(llrs, idx))
        return _combine(res, r2, idx)

    return decode
