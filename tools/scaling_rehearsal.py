#!/usr/bin/env python
"""Multi-host scaling rehearsal on single-machine resources.

Real multi-host TPU hardware is not reachable from this environment, so
this tool pre-evidences the two halves of the ">=95% scaling 1 chip -> >=2
hosts" claim that CAN be measured here (VERDICT r2 item 5):

1. `--mode cpu2proc` — LOGICAL-pipeline scaling. The same global program
   (identical 8-virtual-device batch mesh, identical RNG stream, identical
   psum'd counters) is executed (a) by ONE process owning all 8 devices on
   all 4 cores, and (b) by TWO taskset-pinned processes owning 4 devices /
   2 cores each with collectives over Gloo (parallel/launch.py). Total
   compute resources are equal, per-process work dominates, so the
   wall-clock ratio isolates the distributed-runtime overhead (coordination
   + cross-process psums). Scaling = t_1proc / t_2proc; >= 0.95 means the
   logical pipeline adds <5% overhead when split across processes.
   Throughput is read from the SECOND sweep point (the first pays compile).

2. `--mode tpu-wrapper` — per-chip wrapper overhead. On the real chip,
   the production multi-chip path wraps the Pallas kernel in jax.shard_map
   over the batch mesh (channel.awgn.shard_map_decoder). A 1-device TPU
   mesh runs the identical wrapped program minus the ICI traffic, so
   bare-vs-wrapped steady-state throughput bounds what the wrapper itself
   costs per chip (psums across >=2 real chips ride ICI and add the only
   unmeasurable term).

Results are recorded in STATUS.md ("multi-host scaling rehearsal").
"""

from __future__ import annotations

import argparse
import os
import re
import socket
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# one compile point + one measured point (same step fn, no recompile).
# batch is large so one step is ~1s of pure device compute per process —
# "per-process work dominates" is the premise of the scaling claim (at
# batch 1024 the Gloo/dispatch coordination dominated instead: 0.48).
SWEEP = dict(code="TC128", snrs="1.0,1.0", batch=16384, maxiters=20,
             max_bits=16384 * 64 * 12, max_bit_errors=10**9, seed=3)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch_cmd(extra, cpus: str | None):
    cmd = [
        sys.executable, "-m", "labrador_ldpc_tpu.parallel.launch",
        "--code", SWEEP["code"], "--snrs", SWEEP["snrs"],
        "--batch", str(SWEEP["batch"]), "--maxiters", str(SWEEP["maxiters"]),
        "--max-bits", str(SWEEP["max_bits"]),
        "--max-bit-errors", str(SWEEP["max_bit_errors"]),
        "--seed", str(SWEEP["seed"]), "--verbose",
    ] + extra
    if cpus is not None:
        cmd = ["taskset", "-c", cpus] + cmd
    return cmd


_RATE = re.compile(r"cw/s=([\d,]+)")


def _last_rate(stderr: str) -> float:
    rates = _RATE.findall(stderr)
    assert rates, f"no cw/s lines in:\n{stderr[-2000:]}"
    return float(rates[-1].replace(",", ""))


def mode_cpu2proc(pin: bool = True) -> int:
    port = _free_port()
    # (a) one process, all 8 virtual devices, all 4 cores
    p = subprocess.run(
        _launch_cmd(["--coordinator", f"127.0.0.1:{port}",
                     "--num-processes", "1", "--process-id", "0",
                     "--cpu-devices", "8"], cpus="0-3"),
        cwd=REPO, capture_output=True, text=True, timeout=1200,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    r1 = _last_rate(p.stderr)
    print(f"1 proc x 8 dev x 4 cores: {r1:,.0f} cw/s (warm point)")

    # (b) two processes, 4 devices each, Gloo collectives. `pin` hard-
    # partitions the cores 2+2 (strict resource split, but halves each
    # XLA thread pool's cores — a penalty real multi-host does not have,
    # where every process owns a full machine); unpinned lets the OS
    # schedule 2x4 threads on 4 cores (equal oversubscription both sides).
    port = _free_port()
    procs = []
    for pid, cpus in ((0, "0-1" if pin else None), (1, "2-3" if pin else None)):
        procs.append(subprocess.Popen(
            _launch_cmd(["--coordinator", f"127.0.0.1:{port}",
                         "--num-processes", "2", "--process-id", str(pid),
                         "--cpu-devices", "4"], cpus=cpus),
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    errs = []
    for p in procs:
        out, err = p.communicate(timeout=1200)
        assert p.returncode == 0, err[-2000:]
        errs.append(err)
    r2 = _last_rate(errs[0])  # process 0 emits the verbose lines
    label = "2 cores" if pin else "shared cores"
    print(f"2 proc x 4 dev x {label}: {r2:,.0f} cw/s (warm point)")
    scaling = r2 / r1
    print(f"logical-pipeline scaling (equal total cores): {scaling:.3f}")
    return 0 if scaling >= 0.95 else 1


def mode_tpu_wrapper() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
    import jax.numpy as jnp
    import numpy as np

    from labrador_ldpc_tpu.channel.awgn import shard_map_decoder
    from labrador_ldpc_tpu.codes.params import get_code
    from labrador_ldpc_tpu.ops.pallas_qc import make_ms_decoder_pallas_layered
    from labrador_ldpc_tpu.parallel import make_batch_mesh

    code = get_code("TM8192")
    B, IT = 16384, 20
    rng = np.random.default_rng(0)
    noise = jax.device_put(jnp.asarray(rng.standard_normal((B, code.n)), jnp.float32))
    dec = make_ms_decoder_pallas_layered(code, jnp.float32, maxiters=IT)
    mesh = make_batch_mesh(jax.devices()[:1])
    wrapped = jax.jit(shard_map_decoder(dec, mesh))

    def timeit(fn):
        np.asarray(fn(noise).iterations)  # compile + settle
        t0 = time.perf_counter()
        reps, pipe = 5, 4
        for _ in range(reps):
            outs = [fn(noise) for _ in range(pipe)]
            np.asarray(outs[-1].iterations)
        return B * IT / ((time.perf_counter() - t0) / (reps * pipe))

    bare = timeit(dec)
    wrap = timeit(wrapped)
    print(f"bare pallas_layered:      {bare/1e6:.2f}M cw*iter/s")
    print(f"shard_map(1-dev mesh):    {wrap/1e6:.2f}M cw*iter/s")
    print(f"wrapper overhead: {100 * (1 - wrap / bare):.1f}%")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["cpu2proc", "tpu-wrapper"], required=True)
    ap.add_argument("--no-pin", action="store_true",
                    help="cpu2proc: skip taskset core partitioning")
    args = ap.parse_args()
    if args.mode == "cpu2proc":
        return mode_cpu2proc(pin=not args.no_pin)
    return mode_tpu_wrapper()


if __name__ == "__main__":
    raise SystemExit(main())
