"""Benchmark the VMEM-resident Pallas QC decoder vs the XLA QC decoder.

Usage: python tools/bench_pallas_qc.py [CODE] [B] [bt1,bt2,...]
Runs the reference bench protocol (3 flipped bits, maxiters=50) for f32 and
bf16, prints cw/s for the XLA qc path and each Pallas batch-tile size.
"""

import sys
import os
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np

from labrador_ldpc_tpu.codes.params import get_code
from labrador_ldpc_tpu.ops.convert import hard_to_llrs
from labrador_ldpc_tpu.ops.encoder import encode
from labrador_ldpc_tpu.ops.qc_minsum import make_ms_decoder_qc
from labrador_ldpc_tpu.ops.pallas_qc import make_ms_decoder_pallas_qc


def bench(decoder, llrs, reps=5):
    t_c0 = time.perf_counter()
    res = decoder(llrs)
    jax.block_until_ready(res)
    compile_s = time.perf_counter() - t_c0
    ok = bool(np.asarray(res.success).all())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(decoder(llrs))
        best = min(best, time.perf_counter() - t0)
    return llrs.shape[0] / best, ok, compile_s, res


def main():
    code_name = sys.argv[1] if len(sys.argv) > 1 else "TM8192"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    tiles = [int(t) for t in sys.argv[3].split(",")] if len(sys.argv) > 3 else [32, 64, 128]
    code = get_code(code_name)
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, (B, code.k // 8), dtype=np.uint8)
    cw = np.array(encode(code, jnp.asarray(data)))
    cw[:, 0] ^= (1 << 7) | (1 << 5) | (1 << 3)

    for dtype, dname in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        llrs = jax.device_put(hard_to_llrs(jnp.asarray(cw), dtype))
        xla_rate, ok, cs, xres = bench(make_ms_decoder_qc(code, dtype, maxiters=50), llrs)
        print(f"{code_name} {dname} B={B} xla_qc: {xla_rate:,.0f} cw/s ok={ok} compile={cs:.1f}s", flush=True)
        for bt in tiles:
            try:
                dec = make_ms_decoder_pallas_qc(code, dtype, maxiters=50, batch_tile=bt)
                rate, ok, cs, pres = bench(dec, llrs)
                exact = ""
                if dname == "f32":
                    same_bits = bool((np.asarray(pres.bits) == np.asarray(xres.bits)).all())
                    same_it = bool((np.asarray(pres.iterations) == np.asarray(xres.iterations)).all())
                    exact = f" bit-exact={same_bits} iters-exact={same_it}"
                print(f"{code_name} {dname} B={B} pallas bt={bt}: {rate:,.0f} cw/s "
                      f"({rate / xla_rate:.2f}x) ok={ok} compile={cs:.1f}s{exact}", flush=True)
            except Exception as e:
                print(f"{code_name} {dname} B={B} pallas bt={bt}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
