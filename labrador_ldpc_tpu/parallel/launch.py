"""Multi-host execution: process bootstrap + globally-sharded waterfall.

The reference's only scaling mechanism is the perftest's rayon thread pool
on one machine (perftest/src/main.rs:39-49). The TPU-native counterpart
spans *hosts*: every process of a multi-host slice calls
:func:`initialize` (a thin wrapper over ``jax.distributed.initialize``),
after which ``jax.devices()`` is the global device list and the 1-D batch
mesh from ``parallel.make_batch_mesh()`` spans all chips of all hosts. The
trial pipeline is exactly the single-process one (channel.awgn
make_trial_step): the batch shards P('batch') over ICI/DCN and the
aggregate counters come back as psums, so every process observes identical
global statistics — the cross-host analog of the perftest's AtomicU64
merge (main.rs:42-49).

Real deployment (one command per host, e.g. via the TPU VM runtime or
mpirun):

    python -m labrador_ldpc_tpu.parallel.launch \
        --coordinator host0:8476 --num-processes 4 --process-id $i \
        --code TM8192 --snrs 1.0,1.1,1.2

On environments without multi-host hardware the same code path is
validated with multiple CPU processes (``--cpu-devices D`` forces the CPU
backend with D virtual devices per process; collectives run over Gloo) —
tests/test_distributed.py asserts 2-process global counters are identical
to the single-process 8-device run.
"""

from __future__ import annotations

import argparse
import sys

import jax

__all__ = ["initialize", "distributed_waterfall", "main"]


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
    cpu_devices: int | None = None,
) -> None:
    """Bootstrap this process into the global JAX runtime.

    Must be called before any other JAX use in the process. On Cloud TPU
    all arguments may be omitted (auto-detected from the TPU metadata). For
    manual clusters, pass the coordinator ``host:port``, the total process
    count, and this process's id. ``cpu_devices`` forces the CPU backend
    with that many virtual devices (multi-process emulation/testing).
    """
    if cpu_devices is not None:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", cpu_devices)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def distributed_waterfall(csv_out=None, verbose: bool = False, **kwargs):
    """Run channel.waterfall sharded over ALL hosts' devices.

    Requires :func:`initialize` first. `batch` (in kwargs) is the GLOBAL
    batch and must divide by the global device count. Every process returns
    the same list of SnrPoint (counters are global psums); `csv_out` /
    `verbose` output is emitted from process 0 only.
    """
    from ..channel.waterfall import waterfall
    from .mesh import make_batch_mesh

    if jax.process_index() != 0:
        csv_out, verbose = None, False
    return waterfall(
        mesh=make_batch_mesh(jax.devices()),
        csv_out=csv_out,
        verbose=verbose,
        **kwargs,
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="labrador_ldpc_tpu.parallel.launch",
        description="multi-host BER waterfall (run one instance per host)",
    )
    ap.add_argument("--coordinator", default=None, help="process-0 host:port")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--cpu-devices", type=int, default=None,
                    help="force CPU backend with N virtual devices (testing)")
    ap.add_argument("--code", default="TM8192")
    ap.add_argument("--snrs", required=True, help="comma-separated dB list")
    ap.add_argument("--batch", type=int, default=8192, help="GLOBAL batch")
    ap.add_argument("--maxiters", type=int, default=100)
    ap.add_argument("--max-bits", type=int, default=50_000_000)
    ap.add_argument("--max-bit-errors", type=int, default=5_000)
    ap.add_argument("--noise-model", choices=["perftest", "ebn0"], default="perftest")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--impl", default="qc")
    ap.add_argument("--alpha", type=float, default=None)
    ap.add_argument("--llr-scale", type=float, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args(argv)

    initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
        cpu_devices=args.cpu_devices,
    )
    distributed_waterfall(
        code=args.code,
        snrs_db=[float(s) for s in args.snrs.split(",")],
        batch=args.batch,
        maxiters=args.maxiters,
        max_bits=args.max_bits,
        max_bit_errors=args.max_bit_errors,
        noise_model=args.noise_model,
        dtype_name=args.dtype,
        alpha=args.alpha,
        impl=args.impl,
        llr_scale=args.llr_scale,
        seed=args.seed,
        csv_out=sys.stdout,
        verbose=args.verbose,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
