"""Headline benchmark: decoded codewords/s/chip, TM8192 (k=4096, r=1/2).

Protocol mirrors the reference's decode microbenchmark scenario
(benches/decode.rs:39-71): encode a codeword, flip 3 bits in byte 0, min-sum
decode with maxiters=50 (converges in a few iterations), f32 LLRs. We run a
large batch, steady-state timed over several repetitions on one chip.

Timing is PIPELINED: K decode dispatches are enqueued back-to-back (JAX
dispatch is async) and synced once, so the measurement is sustained
device throughput — the way a production decoder server drives the chip —
rather than K times the host<->device round-trip latency. In this
environment the TPU sits behind a tunnel with a ~30-45 ms per-dispatch
round trip, which at B=16384 is larger than the device time of the whole
decode; a blocking per-dispatch protocol measures the tunnel, not the
kernel (CLAUDE.md dispatch-latency rule).

Two details make the number trustworthy:
  * the sync is a device->host fetch of (a slice of) the LAST dispatch's
    output — TPU programs run in dispatch order, so the copy cannot
    complete early; `jax.block_until_ready` through this tunnel has been
    observed returning before the device finished;
  * the run is timed at FOUR in-flight depths (K/4, K/2, 3K/4, K; best of
    3 repetitions each) and the reported rate is the least-squares SLOPE
    of time vs dispatches, which cancels the constant per-sync tunnel
    round trip instead of amortizing it — the same way a linear fit
    removes a fixed harness cost. A 4-point fit pins the slope against
    single-point tunnel jitter far better than the earlier 2-point
    difference (measured ±7% run-to-run spread, VERDICT r3): one noisy
    endpoint tilts the fit by ~1/4 of what it did to the difference. The
    raw K-point rate bounds the slope from below (sanity: the slope may
    exceed it only by the amortized constant), enforced by the 1.5× cap.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md), so vs_baseline is the
ratio against the first recorded value of this same bench if present in
BENCH_BASELINE.json, else 1.0.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import os

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np


def main():
    from labrador_ldpc_tpu.codes.params import get_code
    from labrador_ldpc_tpu.channel.awgn import _make_decoder
    from labrador_ldpc_tpu.ops.convert import hard_to_llrs
    from labrador_ldpc_tpu.ops.encoder import encode

    code = get_code("TM8192")
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    # default pallas_layered: the row-layered VMEM-resident kernel is the
    # fastest production path AND statistically stronger than flooding at
    # the BER anchors (tests/test_ber_regression.py::test_ber_anchor_layered)
    impl = os.environ.get("BENCH_IMPL", "pallas_layered")
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, (B, code.k // 8), dtype=np.uint8)
    cw = np.array(encode(code, jnp.asarray(data)))
    cw[:, 0] ^= (1 << 7) | (1 << 5) | (1 << 3)  # benches/decode.rs:52
    llrs = jax.device_put(hard_to_llrs(jnp.asarray(cw), jnp.float32))

    decoder = _make_decoder(code, jnp.float32, 50, None, impl)
    res = decoder(llrs)  # compile + warmup
    assert bool(np.asarray(res.success).all()), "bench decode must converge"

    def sync(out):
        # device->host fetch of the last dispatch's success vector: cannot
        # return before every earlier dispatch finished (in-order stream)
        np.asarray(out.success)

    def timed(k, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [decoder(llrs) for _ in range(k)]
            sync(outs[-1])
            best = min(best, time.perf_counter() - t0)
            del outs
        return best

    # same 4-point protocol as labrador_ldpc_tpu.utils.timing.pipelined_slope
    # (kept inline here because the fit DIAGNOSTICS below need the raw
    # (k, t) points, which the shared helper does not expose)
    K = int(os.environ.get("BENCH_PIPELINE", "32"))  # max dispatches per timing
    ks = sorted({max(1, K * i // 4) for i in (1, 2, 3, 4)})
    ts = [timed(k) for k in ks]
    # least-squares slope of time vs dispatch count cancels the constant
    # tunnel round trip; 4 points instead of 2 averages out per-point jitter
    ka = np.asarray(ks, np.float64)
    ta = np.asarray(ts, np.float64)
    denom = ((ka - ka.mean()) ** 2).sum()
    sec_per_dispatch = float(((ka - ka.mean()) * (ta - ta.mean())).sum() / max(denom, 1e-12))
    cw_per_s = B / max(sec_per_dispatch, 1e-9)
    # guard against a degenerate fit (noisy small-k points): never report
    # more than 1.5x the amortized K-point rate
    cw_per_s = min(cw_per_s, 1.5 * K * B / ts[-1])
    # Fit diagnostics on STDERR (stdout invariant: exactly one JSON line).
    # Lets round-over-round drift be attributed to fit noise vs real change:
    # raw (k, t) points, residuals vs the fit, and R^2.
    fit = sec_per_dispatch * ka + (ta.mean() - sec_per_dispatch * ka.mean())
    resid = ta - fit
    ss_tot = float(((ta - ta.mean()) ** 2).sum())
    r2 = 1.0 - float((resid**2).sum()) / max(ss_tot, 1e-30)
    print(
        json.dumps(
            {
                "fit_points": [[int(k), round(t, 6)] for k, t in zip(ks, ts)],
                "residuals_s": [round(float(r), 6) for r in resid],
                "r_squared": round(r2, 6),
                "sec_per_dispatch": round(sec_per_dispatch, 6),
                "amortized_rate_cw_s": round(K * B / ts[-1], 1),
            }
        ),
        file=sys.stderr,
    )

    baseline_file = Path(__file__).parent / "BENCH_BASELINE.json"
    vs = 1.0
    if baseline_file.exists():
        base = json.loads(baseline_file.read_text()).get("value")
        if base:
            vs = cw_per_s / base
    print(json.dumps({
        "metric": "TM8192_minsum_f32_decode_throughput",
        "value": round(cw_per_s, 1),
        "unit": "codewords/s/chip",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
