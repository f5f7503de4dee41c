"""Per-dispatch fixed-cost breakdown for the TM8192 headline kernel
(pallas_layered f32, B=16384) — VERDICT r3 item 6's instrument.

*** SUPERSEDED (round 5) by tools/grid_step_cost.py — read this first ***
This instrument's round-4 result (fixed = 3.10 ms/batch, of which
~1.7 ms was attributed to "6-7 us x 256 grid steps") was a MEASUREMENT
ARTIFACT: `_timeit` AMORTIZES the ~30 ms tunnel round trip over
PIPELINE=8 dispatches (it is documented as a conservative lower bound on
rate), which adds a constant ~3-4 ms to every per-dispatch time and was
read back here as device-side "fixed cost". The round-5 instrument
times trains of {8,16,24,32} dispatches and takes the least-squares
SLOPE (cancelling the round trip entirely, the bench.py protocol);
measured this way the device-marginal fixed cost is ZERO within noise
(|fixed| <= 0.06 ms across subtiles S in {1,2,4}; per_iter 3.17-3.28 ms)
and shrinking the grid 2x/4x at constant per-sub-tile VMEM
(make_ms_decoder_pallas_layered(subtiles=S)) does NOT help the headline
(-7%/-1%) — there was no per-grid-step overhead to harvest; input/output
DMA overlaps compute in the pipelined stream. The headline batch is
~3.06 iteration-equivalents of pure loop work. Numbers in STATUS.md.

Method (kept for reference): pure-noise LLRs never converge, so decode
time at maxiters=m is
  t(m) = fixed + m * per_iter        (iteration 0 is peeled; m >= 1)
A least-squares fit over m in {1,2,4,8} separates the per-iteration loop
cost from everything else.

Usage: PYTHONPATH=. python tools/fixed_cost.py   (one TPU process only)
"""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))

import numpy as np
import jax.numpy as jnp

from labrador_ldpc_tpu.codes.params import get_code
from labrador_ldpc_tpu.ops.pallas_qc import make_ms_decoder_pallas_layered

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))
from bench_suite import _sync, _timeit

def timeit(fn, reps=6):
    _sync(fn())
    return _timeit(fn, reps)


rng = np.random.default_rng(0)
code = get_code("TM8192")
B = 16384
noise = jax.device_put(
    jnp.asarray(rng.standard_normal((B, code.n)), jnp.float32))

ms = [1, 2, 4, 8]
ts = []
for m in ms:
    dec = make_ms_decoder_pallas_layered(code, jnp.float32, maxiters=m)
    t = timeit(lambda: dec(noise))
    ts.append(t)
    print(f"maxiters={m}: {t*1e3:8.3f} ms/batch  ({B/t/1e6:.2f}M cw/s)",
          flush=True)

A = np.vstack([np.ones(len(ms)), np.asarray(ms, float)]).T
(fixed, per_iter), *_ = np.linalg.lstsq(A, np.asarray(ts), rcond=None)
print(f"\nfit: fixed = {fixed*1e3:.3f} ms/batch, per_iter = "
      f"{per_iter*1e3:.3f} ms/batch", flush=True)
in_dma = B * code.n * 4 / 819e9
out_dma = B * 10240 * 1 / 819e9  # V=10240 uint8 bits + tiny done/iter rows
print(f"theoretical DMA at 819 GB/s: in {in_dma*1e3:.3f} ms, out "
      f"{out_dma*1e3:.3f} ms (sum {(in_dma+out_dma)*1e3:.3f})", flush=True)
print(f"fixed cost as iteration-equivalents: {fixed/per_iter:.2f}",
      flush=True)

# headline-protocol context: 3-flip batch converges at iteration ~2, so
# the early-exiting batch pays ~fixed + ~2-3 iters; report the share.
print(f"share of a fixed+2.5-iter headline batch: "
      f"{fixed/(fixed+2.5*per_iter)*100:.1f}%", flush=True)
