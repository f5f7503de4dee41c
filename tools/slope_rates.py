"""Device-marginal decode rates for all nine codes (slope protocol).

The bench suite's `_timeit` AMORTIZES the ~30-45 ms tunnel round trip
over PIPELINE=8 dispatches — documented as a conservative lower bound on
device throughput. For the fast codes that harness constant dwarfs the
device time (TC128 at B=65536 decodes in ~0.65 ms/dispatch), so the
suite understates them by up to ~8x. This instrument applies bench.py's
headline methodology to every code: trains of {8,16,24,32} pipelined
dispatches, best-of-3 each, least-squares SLOPE of time vs dispatch
count — the constant round trip cancels in the fit and the number is
sustained device throughput, the production serving rate.

Protocol per code: 3-bit-flip corruption (benches/decode.rs:52),
maxiters=50, f32 layered Pallas kernel (impl=auto route) and the fused
Pallas bit-flip kernel; B = 65536 (TC), 32768 (TM1280/1536),
16384 (M >= 512 TM).

Appends one JSON line per code to benchmarks/results/slope_rates.jsonl.
Run on the real TPU: python tools/slope_rates.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np

OUT = Path(__file__).resolve().parents[1] / "benchmarks/results/slope_rates.jsonl"

BS = {"TC128": 65536, "TC256": 65536, "TC512": 65536,
      "TM1280": 32768, "TM1536": 32768, "TM2048": 16384,
      "TM5120": 16384, "TM6144": 16384, "TM8192": 16384}


from labrador_ldpc_tpu.utils.timing import pipelined_slope as slope  # noqa: E402


def main():
    from labrador_ldpc_tpu.codes.params import get_code
    from labrador_ldpc_tpu.ops.convert import hard_to_llrs
    from labrador_ldpc_tpu.ops.encoder import encode
    from labrador_ldpc_tpu.ops.pallas_bf import make_bf_decoder_pallas
    from labrador_ldpc_tpu.ops.pallas_qc import make_ms_decoder_pallas_layered

    t_start = round(time.time(), 1)
    with open(OUT, "a") as f:
        for name, B in BS.items():
            code = get_code(name)
            rng = np.random.default_rng(0)
            data = rng.integers(0, 256, (B, code.k // 8), dtype=np.uint8)
            cw = np.array(encode(code, jnp.asarray(data)))
            cw[:, 0] ^= (1 << 7) | (1 << 5) | (1 << 3)
            flip_bits = jnp.asarray(np.unpackbits(cw, axis=1))
            flip = jax.device_put(hard_to_llrs(jnp.asarray(cw), jnp.float32))
            dec = make_ms_decoder_pallas_layered(code, jnp.float32, maxiters=50)
            r = dec(flip)
            assert bool(np.asarray(r.success).all()), name
            s_ms = slope(dec, flip, lambda o: np.asarray(o.success))
            bfd = make_bf_decoder_pallas(code, maxiters=50)
            rb = bfd(flip_bits)
            assert bool(np.asarray(rb.success).all()), name
            s_bf = slope(bfd, flip_bits, lambda o: np.asarray(o.success))
            row = {"ts": t_start, "code": name, "batch": B,
                   "ms_layered_f32_cw_s": round(B / s_ms, 1),
                   "bf_cw_s": round(B / s_bf, 1)}
            print(json.dumps(row), flush=True)
            f.write(json.dumps(row) + "\n")
            f.flush()
    print(f"appended to {OUT}")


if __name__ == "__main__":
    main()
