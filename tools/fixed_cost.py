"""Per-dispatch fixed-cost breakdown for the TM8192 headline kernel
(pallas_layered f32, B=16384) — VERDICT r3 item 6's instrument.

Method: pure-noise LLRs never converge, so decode time at maxiters=m is
  t(m) = fixed + m * per_iter        (iteration 0 is peeled; m >= 1)
A least-squares fit over m in {1,2,4,8} separates the per-iteration loop
cost from everything else: input LLR DMA (512 MB), output bits DMA
(172 MB uint8), scratch init, final sign/freeze epilogue, and per-grid-
step pipeline overhead. All timing uses the suite's pipelined honest-
fetch protocol (benchmarks/bench_suite._timeit) to cancel the ~30 ms
tunnel round trip.

Round-4 result (recorded in STATUS.md): fixed = 3.10 ms/batch ~= 0.97
iteration-equivalents (per_iter = 3.19 ms); DMA accounts for 0.86 ms,
init/epilogue sweeps ~0.5 ms, the rest is per-grid-step overhead at
bt=64 x 256 steps (larger tiles measured slower end-to-end, so the
floor stands; in-kernel bit packing bounds at ~1.9% and was rejected).

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
