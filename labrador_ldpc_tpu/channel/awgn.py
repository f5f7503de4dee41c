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
from ..ops.minsum import make_ms_decoder


def _make_decoder(code, dtype, maxiters, alpha, impl: str):
    """Select the min-sum implementation: "ref" (reference-order XLA),
    "qc" (roll-based XLA), "layered" (row-layered schedule), or "pallas"
    (experimental fused kernel)."""
    if impl == "ref":
        return make_ms_decoder(code, dtype, maxiters, alpha)
    if impl == "qc":
        from ..ops.qc_minsum import make_ms_decoder_qc

        return make_ms_decoder_qc(code, dtype, maxiters, alpha)
    if impl == "layered":
        from ..ops.qc_minsum import make_ms_decoder_layered

        return make_ms_decoder_layered(code, dtype, maxiters, alpha)
    if impl == "qc_i8":
        from ..ops.qc_minsum import make_ms_decoder_qc_i8

        if alpha is not None:
            raise ValueError("qc_i8 does not support alpha")
        return make_ms_decoder_qc_i8(code, maxiters)
    if impl == "pallas":
        from ..ops.pallas_minsum import make_ms_decoder_pallas

        return make_ms_decoder_pallas(code, dtype, maxiters, alpha)
    raise ValueError(f"unknown decoder impl {impl!r} (ref|qc|layered|qc_i8|pallas)")

__all__ = ["ChannelStats", "make_trial_step", "make_two_stage_decoder", "noise_sigma"]


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


@lru_cache(maxsize=None)
def make_trial_step(
    code: LDPCCode | str,
    batch: int,
    maxiters: int = 100,
    dtype_name: str = "float32",
    alpha: float | None = None,
    impl: str = "qc",
):
    """Build a jitted end-to-end trial step.

    Returns fn(key, sigma) -> ChannelStats running `batch` codewords:
    random data -> encode -> BPSK +-1 -> AWGN(sigma) -> min-sum -> counters.
    The whole pipeline is one XLA program; under a sharded batch axis the
    final counter sums become psums over the mesh.
    """
    code = get_code(code)
    p = code.params
    dtype = jnp.dtype(dtype_name)
    decoder = _make_decoder(code, dtype, maxiters, alpha, impl)

    def step(key: jax.Array, sigma: jnp.ndarray) -> ChannelStats:
        kd, kn = jax.random.split(key)
        data_bits = jax.random.bernoulli(kd, 0.5, (batch, p.k)).astype(jnp.uint8)
        cw_bits = encode_bits(code, data_bits)  # (B, n)
        # bit 1 -> -1, bit 0 -> +1 (hard_to_llrs convention, decoder.rs:488-492)
        tx = 1.0 - 2.0 * cw_bits.astype(jnp.float32)
        noise = jax.random.normal(kn, tx.shape, jnp.float32) * sigma
        llrs = (tx + noise).astype(dtype)
        res = decoder(llrs)
        data_hat = res.bits[:, : p.k]
        bit_err = (data_hat != data_bits).sum(dtype=jnp.int32, axis=1)  # (B,)
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
):
    """Production two-stage decode: layered fast pass + flooding rescue.

    The layered schedule converges in roughly half the iterations but can
    stall on a tiny fraction of near-threshold frames where the flooding
    self-corrected min-sum still converges. Stage 1 decodes everything with
    the layered decoder; stage 2 re-decodes ONLY the failed frames (host-side
    gather, so the rescue batch is tiny and its cost amortizes to
    failure_rate * batch). Returns fn(llrs: (B, n)) -> MSResult with
    combined results.

    This is a host-orchestrated harness utility (two jit dispatches, data-
    dependent batch), not a jittable op.
    """
    from ..ops.qc_minsum import make_ms_decoder_layered, make_ms_decoder_qc

    code = get_code(code)
    fast = make_ms_decoder_layered(code, dtype, maxiters_fast)
    rescue = make_ms_decoder_qc(code, rescue_dtype, maxiters_rescue)

    def decode(llrs):
        import numpy as np

        res = fast(llrs)
        success = np.asarray(res.success)
        if success.all():
            return res
        bad = np.nonzero(~success)[0]
        # pad the rescue batch to a power-of-two bucket to bound recompiles
        pad = 1 << max(3, int(np.ceil(np.log2(len(bad)))))
        idx = np.pad(bad, (0, pad - len(bad)), mode="edge")
        r2 = rescue(jnp.asarray(np.asarray(llrs, dtype=np.float32)[idx]))
        bits = np.asarray(res.bits).copy()
        succ = success.copy()
        iters = np.asarray(res.iterations).copy()
        bits[bad] = np.asarray(r2.bits)[: len(bad)]
        succ[bad] = np.asarray(r2.success)[: len(bad)]
        iters[bad] = maxiters_fast + np.asarray(r2.iterations)[: len(bad)]
        from ..ops.minsum import MSResult

        return MSResult(
            success=jnp.asarray(succ),
            iterations=jnp.asarray(iters),
            bits=jnp.asarray(bits),
        )

    return decode
