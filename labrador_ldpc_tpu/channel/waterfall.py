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

import json
import sys
import time
from dataclasses import asdict, dataclass
from pathlib import Path

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


class _Checkpoint:
    """Append-only JSONL persistence of partial waterfall counts.

    The reference perftest has no resume (a killed sweep restarts from
    scratch); SURVEY.md section 5 names 'persisting BER-sweep partial
    counts' as the one checkpoint/resume capability worth building here.
    One line per drained batch: the current point's counters plus the
    cumulative number of RNG key splits DRAINED so far. On resume the key
    chain is fast-forwarded by that many splits, so the continued trial
    stream is the deterministic suffix of the uninterrupted one (batches
    that were in flight but never drained are simply re-run). A config
    header line guards against resuming with mismatched parameters.
    """

    def __init__(self, path, config: dict):
        self.path = Path(path)
        self.config = config
        self.points: dict[float, dict] = {}
        self.splits = 0
        if self.path.exists():
            with self.path.open() as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    if rec.get("kind") == "config":
                        # keys added after a checkpoint format was already
                        # in the wild compare against their historical
                        # default, so old checkpoints stay resumable
                        defaults = {"decoder": "ms"}
                        mismatched = {
                            k: (v, rec.get(k, defaults.get(k)))
                            for k, v in config.items()
                            if rec.get(k, defaults.get(k)) != v
                        }
                        if mismatched:
                            raise ValueError(
                                f"checkpoint {self.path} was written with different "
                                f"parameters: {mismatched}"
                            )
                    elif rec.get("kind") == "point":
                        self.points[float(rec["snr_db"])] = rec
                        self.splits = max(self.splits, int(rec["splits"]))
            self._f = self.path.open("a")
        else:
            self._f = self.path.open("w")
            self._write({"kind": "config", **config})

    def _write(self, rec: dict):
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def lookup(self, snr_db: float) -> tuple[SnrPoint | None, bool]:
        """(restored point or None, whether it already completed)."""
        rec = self.points.get(float(snr_db))
        if rec is None:
            return None, False
        pt = SnrPoint(
            **{k: rec[k] for k in SnrPoint.__dataclass_fields__ if k in rec}
        )
        return pt, bool(rec.get("done"))

    def record(self, pt: SnrPoint, splits: int, done: bool):
        self._write({"kind": "point", **asdict(pt), "splits": splits, "done": done})

    def close(self):
        self._f.close()


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
    impl: str = "auto",
    llr_scale: float | None = None,
    mesh=None,
    seed: int = 0,
    csv_out=None,
    verbose: bool = False,
    pipeline_depth: int = 4,
    checkpoint=None,
    decoder: str = "ms",
) -> list[SnrPoint]:
    """Run a BER/FER waterfall sweep; returns one SnrPoint per SNR.

    Stopping rules per point mirror the reference: stop when `max_bits` data
    bits have been simulated or `max_bit_errors` bit errors observed.

    `decoder` selects the decode surface: "ms" (default — soft channel,
    AWGN on LLRs per `noise_model`), "ms_hard" (min-sum on hard-sliced
    channel output, the decode_ms side of the reference's BF-vs-MS
    framing — channel/hard.py), or "bf" (hard-decision bit-flip,
    channel/hard.py): noise_model "bsc" treats the `snrs_db` values as raw
    flip probabilities p, while "perftest"/"ebn0" run the SAME AWGN
    channel as the ms sweep hard-sliced before decoding — so the measured
    BF-vs-MS gap at equal dB is the reference's documented tradeoff
    (src/lib.rs:165-172). bf ignores dtype_name/alpha/llr_scale; its impl
    space is auto|pallas|qc|gather (hard.resolve_bf_impl).

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

    With `checkpoint` (a file path), partial counts are persisted after
    every drained batch; rerunning the same sweep resumes mid-point and
    produces counters identical to an uninterrupted run (see _Checkpoint).
    (If the interruption raced the bit-error budget tripping, the resumed
    run may count up to pipeline_depth fewer in-flight batches than the
    uninterrupted one would have — both are valid stopping outcomes under
    the reference protocol, perftest/src/main.rs:50.)
    """
    code = get_code(code)
    k = code.k
    # resolve "auto" here so the checkpoint config below records the
    # CONCRETE impl (a checkpoint written on TPU must not silently resume
    # onto a different decoder off-TPU)
    if decoder == "bf":
        from .hard import make_bf_trial_step, resolve_bf_impl

        impl = resolve_bf_impl(code, impl)
        step = make_bf_trial_step(code, batch, maxiters, noise_model, impl, mesh)
    elif decoder == "ms_hard":
        # min-sum on hard-sliced channel output (+-1 LLRs): the decode_ms
        # side of the reference's BF-vs-MS framing (channel/hard.py)
        from .awgn import resolve_impl
        from .hard import make_ms_hard_trial_step

        impl = resolve_impl(code, "float32", impl)
        step = make_ms_hard_trial_step(
            code, batch, maxiters, noise_model, impl, mesh
        )
    elif decoder == "ms":
        from .awgn import resolve_impl

        impl = resolve_impl(code, dtype_name, impl)
        step = make_trial_step(
            code, batch, maxiters, dtype_name, alpha, impl, llr_scale, mesh
        )
    else:
        raise ValueError(f"unknown decoder {decoder!r} (ms|ms_hard|bf)")
    key = jax.random.PRNGKey(seed)
    ckpt = None
    splits_drained = 0
    if checkpoint is not None:
        ckpt = _Checkpoint(
            checkpoint,
            {
                "code": code.value,
                "batch": batch,
                "maxiters": maxiters,
                "max_bits": max_bits,
                "max_bit_errors": max_bit_errors,
                "noise_model": noise_model,
                "dtype_name": dtype_name,
                "alpha": alpha,
                "impl": impl,
                "llr_scale": llr_scale,
                "seed": seed,
                "decoder": decoder,
            },
        )
        splits_drained = ckpt.splits
        for _ in range(splits_drained):  # fast-forward the key chain
            key, _sub = jax.random.split(key)
    results = []
    # each step simulates exactly batch*k data bits, so the bits budget
    # translates to a step count ahead of time (matches the old
    # check-before-launch loop exactly when the error budget never binds)
    n_steps_max = max(1, -(-max_bits // (batch * k)))
    for snr in snrs_db:
        # "bsc"/"bec" (hard channels, decoder="bf"): the sweep values ARE
        # the flip/erasure probabilities; the soft models map dB -> sigma
        sigma = (snr if noise_model in ("bsc", "bec")
                 else noise_sigma(snr, code, noise_model))
        pt = SnrPoint(code=code.value, snr_db=snr)
        launched = 0
        elapsed0 = 0.0
        if ckpt is not None:
            restored, done = ckpt.lookup(snr)
            if restored is not None:
                pt = restored
                if done:
                    results.append(pt)
                    if csv_out is not None:
                        print(pt.csv(), file=csv_out, flush=True)
                    continue
                launched = pt.trials // batch  # each step counts exactly batch
                elapsed0 = pt.elapsed_s
        t0 = time.perf_counter()
        inflight: list = []
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
            splits_drained += 1
            if ckpt is not None:
                pt.elapsed_s = elapsed0 + time.perf_counter() - t0
                ckpt.record(pt, splits_drained, done=False)
        pt.elapsed_s = elapsed0 + time.perf_counter() - t0
        if ckpt is not None:
            ckpt.record(pt, splits_drained, done=True)
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
    if ckpt is not None:
        ckpt.close()
    return results
