"""BER/FER waterfall sweep runner.

TPU-native counterpart of the reference perftest harness
(perftest/src/main.rs:34-70): per SNR point, run decode trials until a bit
budget or bit-error budget is hit, then report CSV rows compatible with
perftest/plot.py (`code,snr,trials,bits,errors,ber`, main.rs:62). Where the
reference farms trials over rayon threads and merges counters through an
AtomicU64, we run mesh-sharded batches and the counters come back through
XLA psums (see parallel/mesh.py).
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass

import jax
import numpy as np

from ..codes.params import LDPCCode, get_code
from .awgn import make_trial_step, noise_sigma

__all__ = ["SnrPoint", "waterfall", "DEFAULT_SNRS_TC512"]

# reference sweep: TC512 at 0.8..2.2 dB step 0.1 (perftest/src/main.rs:67-70)
DEFAULT_SNRS_TC512 = [round(0.8 + 0.1 * i, 1) for i in range(15)]


@dataclass
class SnrPoint:
    code: str
    snr_db: float
    trials: int = 0
    bits: int = 0
    bit_errors: int = 0
    frame_errors: int = 0
    decode_failures: int = 0
    iterations: int = 0
    elapsed_s: float = 0.0

    @property
    def ber(self) -> float:
        return self.bit_errors / self.bits if self.bits else 0.0

    @property
    def fer(self) -> float:
        return self.frame_errors / self.trials if self.trials else 0.0

    def csv(self) -> str:
        # schema-compatible with perftest/src/main.rs:62
        return f"{self.code},{self.snr_db},{self.trials},{self.bits},{self.bit_errors},{self.ber:.6e}"


def waterfall(
    code: LDPCCode | str,
    snrs_db: list[float],
    batch: int = 1024,
    maxiters: int = 100,
    max_bits: int = 50_000_000,  # perftest/src/main.rs:50
    max_bit_errors: int = 5_000,  # perftest/src/main.rs:50
    noise_model: str = "perftest",
    dtype_name: str = "float32",
    alpha: float | None = None,
    impl: str = "qc",
    llr_scale: float | None = None,
    mesh=None,
    seed: int = 0,
    csv_out=None,
    verbose: bool = False,
    pipeline_depth: int = 4,
) -> list[SnrPoint]:
    """Run a BER/FER waterfall sweep; returns one SnrPoint per SNR.

    Stopping rules per point mirror the reference: stop when `max_bits` data
    bits have been simulated or `max_bit_errors` bit errors observed.

    Up to `pipeline_depth` trial steps are kept in flight (JAX dispatch is
    async), so the device stays busy instead of paying the host round trip
    between batches — the TPU analog of the reference perftest's in-flight
    rayon workers (perftest/src/main.rs:39-49). Like those workers, batches
    already in flight when the bit-error budget trips are still counted
    (deterministic for a fixed seed/depth); the bits budget is computed
    ahead of launch and never overshoots.

    Integer dtypes quantize the channel LLRs with awgn.quantize_llrs
    (`llr_scale`, default awgn.default_llr_scale(dtype)).

    With `mesh` (a 1-D 'batch' Mesh, e.g. parallel.make_batch_mesh()), the
    whole trial pipeline is sharded P('batch') across the mesh and the
    counters come back as psums — the multi-chip path. `batch` is then the
    GLOBAL batch and must divide by the mesh size. All impl/dtype/alpha
    combinations behave identically sharded and unsharded (one shared
    trial-step definition).
    """
    code = get_code(code)
    k = code.k
    step = make_trial_step(code, batch, maxiters, dtype_name, alpha, impl, llr_scale, mesh)
    key = jax.random.PRNGKey(seed)
    results = []
    # each step simulates exactly batch*k data bits, so the bits budget
    # translates to a step count ahead of time (matches the old
    # check-before-launch loop exactly when the error budget never binds)
    n_steps_max = max(1, -(-max_bits // (batch * k)))
    for snr in snrs_db:
        sigma = noise_sigma(snr, code, noise_model)
        pt = SnrPoint(code=code.value, snr_db=snr)
        t0 = time.perf_counter()
        inflight: list = []
        launched = 0
        while True:
            while (
                launched < n_steps_max
                and len(inflight) < max(1, pipeline_depth)
                and pt.bit_errors < max_bit_errors
            ):
                key, sub = jax.random.split(key)
                inflight.append(step(sub, sigma))
                launched += 1
            if not inflight:
                break
            stats = jax.tree.map(lambda x: np.asarray(x), inflight.pop(0))
            pt.trials += int(stats.trials)
            pt.bits += int(stats.trials) * k
            pt.bit_errors += int(stats.bit_errors)
            pt.frame_errors += int(stats.frame_errors)
            pt.decode_failures += int(stats.decode_failures)
            pt.iterations += int(stats.iterations)
        pt.elapsed_s = time.perf_counter() - t0
        results.append(pt)
        line = pt.csv()
        if csv_out is not None:
            print(line, file=csv_out, flush=True)
        if verbose:
            print(
                f"{line}  fer={pt.fer:.3e} cw/s={pt.trials / max(pt.elapsed_s, 1e-9):,.0f}",
                file=sys.stderr,
                flush=True,
            )
    return results
