"""Multi-host execution path: 2 real processes over Gloo CPU collectives.

Spawns two subprocesses that each join a jax.distributed cluster
(parallel/launch.py) with 4 virtual CPU devices apiece — an 8-device global
mesh spanning 2 processes — and run the distributed waterfall. The global
psum'd counters must be IDENTICAL to the same sweep on the single-process
8-device mesh: jax.random semantics are sharding-invariant, so the logical
program does not depend on how the 8 devices are partitioned into
processes. This is the cross-host analog of the reference perftest's
AtomicU64 counter merge (perftest/src/main.rs:42-49).
"""

import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

SWEEP = dict(snrs="2.0,4.0", batch=32, maxiters=10, max_bits=32 * 64 * 2,
             max_bit_errors=10**9, seed=3)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def two_process_csv():
    port = _free_port()
    procs = []
    for pid in (0, 1):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-m", "labrador_ldpc_tpu.parallel.launch",
                    "--coordinator", f"127.0.0.1:{port}",
                    "--num-processes", "2", "--process-id", str(pid),
                    "--cpu-devices", "4",
                    "--code", "TC128",
                    "--snrs", SWEEP["snrs"],
                    "--batch", str(SWEEP["batch"]),
                    "--maxiters", str(SWEEP["maxiters"]),
                    "--max-bits", str(SWEEP["max_bits"]),
                    "--max-bit-errors", str(SWEEP["max_bit_errors"]),
                    "--seed", str(SWEEP["seed"]),
                ],
                cwd=REPO,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"launch process failed:\n{err[-2000:]}"
        outs.append(out)
    return outs


def test_two_process_counters_match_single_process(two_process_csv):
    out0, out1 = two_process_csv
    rows = [l for l in out0.splitlines() if l.startswith("TC128,")]
    assert len(rows) == 2, out0
    # only process 0 emits CSV
    assert not [l for l in out1.splitlines() if l.startswith("TC128,")]

    from labrador_ldpc_tpu.channel import waterfall

    pts = waterfall(
        "TC128",
        [float(s) for s in SWEEP["snrs"].split(",")],
        batch=SWEEP["batch"],
        maxiters=SWEEP["maxiters"],
        max_bits=SWEEP["max_bits"],
        max_bit_errors=SWEEP["max_bit_errors"],
        seed=SWEEP["seed"],
    )
    # single-process run here uses the conftest 8-device CPU mesh implicitly
    # only through jax.random semantics — counters are device-layout
    # invariant, so the unsharded run is the oracle
    assert rows == [p.csv() for p in pts]
