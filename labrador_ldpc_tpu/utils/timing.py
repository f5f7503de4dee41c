"""Pipelined slope timing — the one true per-dispatch protocol.

Used by bench.py, tools/grid_step_cost.py, tools/slope_rates.py (they
previously carried three copies — round-5 review finding). Trains of
{k/4, k/2, 3k/4, k} back-to-back dispatches, best-of-`reps` each, then
the least-squares SLOPE of train time vs dispatch count: the constant
sync/tunnel round trip (~30-45 ms here) cancels in the fit instead of
being amortized into the answer, so the number is sustained
device-marginal time per dispatch. A two-point difference is NOT a safe
substitute: for ~1 ms dispatches it measured negative values through
this environment's tunnel jitter (tools/fixed_cost.py history).

The sync MUST be an honest device->host fetch of (a slice of) the LAST
dispatch's output — TPU programs run in dispatch order, so the copy
cannot complete early; `jax.block_until_ready` has been observed
returning before the device finished through this tunnel.
"""

from __future__ import annotations

import time

import numpy as np

__all__ = ["pipelined_slope"]


def pipelined_slope(fn, arg, sync, k: int = 32, reps: int = 3):
    """Seconds per dispatch of `fn(arg)` (see module docstring).

    fn must enqueue asynchronously and return the unblocked result;
    sync(out) must fetch part of `out` to the host.
    """

    def train(count):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [fn(arg) for _ in range(count)]
            sync(outs[-1])
            best = min(best, time.perf_counter() - t0)
            del outs
        return best

    ks = sorted({max(1, k * i // 4) for i in (1, 2, 3, 4)})
    ts = [train(c) for c in ks]
    xs, ys = np.asarray(ks, np.float64), np.asarray(ts, np.float64)
    denom = float(((xs - xs.mean()) ** 2).sum())
    return float(((xs - xs.mean()) * (ys - ys.mean())).sum() / max(denom, 1e-12))
