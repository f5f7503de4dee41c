#!/usr/bin/env python
"""Microbenchmark suite mirroring the reference's benches/ harnesses.

Reference coverage (benches/encode.rs:25-59, benches/decode.rs:22-101,
benches/iter_paritychecks.rs:14-22) and what each maps to here:

  * encode x 9 codes           -> batched MXU encode, data MB/s + cw/s
  * decode_bf x 9 codes        -> batched bit-flip, 3 bit flips, 50 iters
  * decode_ms x dtypes x codes -> batched min-sum across implementations
                                  (ref-order XLA / QC XLA / fused Pallas)
                                  and dtypes (f32, bf16, i8)
  * edge iteration rate        -> decoder-table build time (the analog of
                                  ParityIter throughput: H expansion cost)
  * capi single-codeword       -> native C++ scalar codec latency (the
                                  closest analog of the reference's
                                  single-codeword numbers)

Results print as a table and are appended as JSON lines to
benchmarks/results.jsonl with enough metadata to compare across runs.

Usage:
    python benchmarks/bench_suite.py --quick        # TC128+TM8192 only
    python benchmarks/bench_suite.py                # full sweep
    python benchmarks/bench_suite.py --filter ms    # substring filter
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

# persistent compile cache: Mosaic/XLA compiles through this environment's
# remote helper take minutes; cache hits make chunked/re-run sweeps cheap
import os as _os

import jax as _jax

_jax.config.update("jax_compilation_cache_dir", _os.path.expanduser("~/.cache/jax"))
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def _sync(out):
    """Force completion of ALL enqueued work by fetching a small piece of
    the LAST result to the host.

    TPU programs execute in dispatch order, so a device->host copy of the
    last dispatch's output cannot return before every earlier dispatch has
    finished. `jax.block_until_ready` is NOT trustworthy through this
    environment's tunnel: it has been observed returning while the device
    was still working (a TM5120 encode once "measured" 407M cw/s, ~100x
    the physically possible rate — the honest fetch-synced number is ~7M).
    """
    import jax

    arrs = [l for l in jax.tree_util.tree_leaves(out) if isinstance(l, jax.Array)]
    if not arrs:
        return
    a = min(arrs, key=lambda l: l.size)
    if a.size > (1 << 16):
        a = a.ravel()[:8]  # tiny dependent slice: 1 extra dispatch, 8-elem copy
    np.asarray(a)


def _timeit(fn, reps=5):
    """Best-of-reps time for ONE unit of work, measured PIPELINED.

    `fn` must enqueue its work and return the unblocked result; _timeit
    enqueues PIPELINE of them back-to-back and syncs once (see _sync), so
    the number reflects sustained device throughput rather than the
    host<->device round trip (~30-45 ms through this environment's tunnel —
    larger than the device time of most of these workloads; CLAUDE.md
    dispatch rule). The single round trip is amortized, not subtracted, so
    the reported rate is a conservative lower bound on device throughput.
    """
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(PIPELINE)]
        _sync(outs[-1])
        best = min(best, (time.perf_counter() - t0) / PIPELINE)
        del outs
    return best


PIPELINE = 8

# The production paths: a SKIP (compile failure, convergence anomaly, or
# any exception) in one of these is a real regression, not a benchmark
# hole. --strict turns such SKIPs into a nonzero exit (VERDICT r3 item 5:
# "a Mosaic compile or semantics regression in any production kernel must
# fail a recorded artifact the same day it lands").
PRODUCTION_IMPLS = {"pallas_qc", "pallas_layered"}
STRICT_VIOLATIONS: list[str] = []

# --filter substring; set once in main(). Benches whose FAMILY name (the
# label up to any '[') does not contain it are SKIPPED AT RUN TIME (not
# merely dropped from the JSONL), so a targeted re-measurement, e.g.
# `--codes TM1280 --filter bf`, costs minutes instead of a full sweep.
# Family matching keeps 'bf' from also selecting decode_ms[...,bfloat16];
# use --impls to narrow the ms benches by impl/dtype.
RUN_FILTER = ""


def _want(label: str) -> bool:
    # Match the family name (label up to '[') OR the full label, so a
    # filter value containing '[' (e.g. 'decode_bf[pallas]') still selects
    # benches instead of silently matching nothing (ADVICE r4).
    return (
        not RUN_FILTER
        or RUN_FILTER in label.split("[", 1)[0]
        or RUN_FILTER in label
    )


def _skip(label, code_name, reason, impl=None):
    msg = f"{label} {code_name}: SKIP ({reason})"
    print(msg)
    if impl in PRODUCTION_IMPLS or (impl is None and "pallas" in label):
        STRICT_VIOLATIONS.append(msg)


def bench_all(codes, impls, base_batch, reps, results):
    import jax
    import jax.numpy as jnp

    from labrador_ldpc_tpu.codes.expand import decoder_tables
    from labrador_ldpc_tpu.codes.params import get_code
    from labrador_ldpc_tpu.ops import bitflip, encoder
    from labrador_ldpc_tpu.ops.convert import hard_to_llrs, unpack_bits
    from labrador_ldpc_tpu.channel.awgn import _make_decoder

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)

    def record(name, code, value, unit, **meta):
        row = dict(bench=name, code=code, value=round(value, 3), unit=unit,
                   device=str(dev), batch=batch, **meta)
        results.append(row)
        print(f"{name:28} {code:8} {value:>14,.1f} {unit}")

    for name in codes:
        code = get_code(name)
        # scale the batch so per-dispatch fixed costs amortize and the
        # device time dominates: 8x for small codes, 4x for the big TM
        # codes (16384 matches the headline bench.py protocol)
        batch = base_batch * 8 if code.n <= 2048 else base_batch * 4
        k_bytes = code.k // 8
        data = rng.integers(0, 256, (batch, k_bytes), dtype=np.uint8)
        data_j = jax.device_put(jnp.asarray(data))

        # --- encode (benches/encode.rs: b.bytes = k/8) ---------------------
        enc = encoder.make_encoder(code)  # also the fixture for everything
        _sync(enc(data_j))
        if _want("encode"):
            t = _timeit(lambda: enc(data_j), reps)
            record("encode", name, batch / t, "cw/s")
            record("encode_data_rate", name, batch * k_bytes / t / 1e6, "MB/s")

        # --- corrupted codeword fixtures (3 bit flips, decode.rs:52) -------
        cw = np.array(enc(data_j))
        cw[:, 0] ^= (1 << 7) | (1 << 5) | (1 << 3)
        cw_j = jax.device_put(jnp.asarray(cw))

        # --- decode_bf (benches/decode.rs:22-37) ---------------------------
        want_bf_pallas = _want("decode_bf[pallas]")
        bits = unpack_bits(cw_j)
        if _want("decode_bf") or want_bf_pallas:
            bf = bitflip.make_bf_decoder_qc(code, maxiters=50)
            _sync(bf(bits))
        if _want("decode_bf"):
            t = _timeit(lambda: bf(bits), reps)
            record("decode_bf", name, batch / t, "cw/s", maxiters=50)

        # --- decode_bf, fused Pallas kernel (all 9 codes in the
        # measured-best layout: M <= 256 transposed node-major, M >= 512
        # lane-roll), asserted bit-exact vs the XLA QC path on-device
        # before timing --------------------------------------------------
        from labrador_ldpc_tpu.ops.pallas_bf import make_bf_decoder_pallas

        if want_bf_pallas:
            try:
                bfp = make_bf_decoder_pallas(code, maxiters=50)
                res_p = bfp(bits)
                _sync(res_p)
                res_q = bf(bits)
                bits_eq = np.array_equal(np.asarray(res_p.bits),
                                         np.asarray(res_q.bits))
                iters_eq = np.array_equal(np.asarray(res_p.iterations),
                                          np.asarray(res_q.iterations))
            except Exception as e:  # noqa: BLE001 - report and continue
                _skip("decode_bf[pallas]", name, f"{type(e).__name__}: {e}")
            else:
                if not (bits_eq and iters_eq):
                    _skip("decode_bf[pallas]", name,
                          "failed the on-device bit-exactness assert vs the "
                          "XLA QC path")
                else:
                    t = _timeit(lambda: bfp(bits), reps)
                    record("decode_bf[pallas]", name, batch / t, "cw/s",
                           maxiters=50)

        # --- steady-state bf per-iteration rate ----------------------------
        # uniform-random bits (almost) never satisfy all checks, so the
        # batch runs the fixed budget — the fixture-independent bf kernel
        # metric, mirroring ms_iter below. (Punctured codes also pay the
        # one-time in-path erasure pass; it is part of every real decode.)
        bf_iters = 20
        rand_bits = jax.device_put(
            jnp.asarray(rng.integers(0, 2, (batch, code.n)), jnp.uint8))
        for label, mk in (
            ("bf_iter", lambda: bitflip.make_bf_decoder_qc(code, bf_iters)),
            ("bf_iter[pallas]",
             lambda: make_bf_decoder_pallas(code, bf_iters)),
        ):
            if not _want(label):
                continue
            try:
                dec = mk()
                res = dec(rand_bits)
                _sync(res)
            except Exception as e:  # noqa: BLE001 - report and continue
                _skip(label, name, f"{type(e).__name__}: {e}")
                continue
            conv = float(np.asarray(res.success).mean())
            if conv > 0.05:
                _skip(label, name, f"random bits converged {conv:.0%}")
                continue
            t = _timeit(lambda: dec(rand_bits), reps)
            record(label, name, batch * bf_iters / t, "cw_iter/s",
                   maxiters=bf_iters)

        # --- decode_sp: the fused layered sum-product kernel (round-5
        # quality surface; lane-major codes only — smaller codes serve
        # the XLA twin and SP is not wanted there). 3-flip protocol with
        # true-LLR-style +-4 inputs (BP is scale-sensitive; +-4 ~ a
        # BSC(2%) LLR magnitude, comfortably convergent) ------------------
        if _want("decode_sp[pallas]"):
            from labrador_ldpc_tpu.ops.pallas_sp import make_sp_decoder_pallas
            from labrador_ldpc_tpu.ops.routing import route_for

            if route_for(code).ms_layout == "lane_major":
                try:
                    spd = make_sp_decoder_pallas(code, maxiters=50)
                    sp_llrs = jax.device_put(
                        hard_to_llrs(cw_j, jnp.float32) * 4.0)
                    res = spd(sp_llrs)
                    _sync(res)
                except Exception as e:  # noqa: BLE001 - report and continue
                    _skip("decode_sp[pallas]", name,
                          f"{type(e).__name__}: {e}")
                else:
                    if not bool(np.asarray(res.success).all()):
                        _skip("decode_sp[pallas]", name,
                              "3-flip batch failed to converge")
                    else:
                        t = _timeit(lambda: spd(sp_llrs), reps)
                        record("decode_sp[pallas]", name, batch / t, "cw/s",
                               maxiters=50)

        # --- decode_ms variants (benches/decode.rs:39-71) ------------------
        for impl, dtype_name in impls:
            if not _want(f"decode_ms[{impl},{dtype_name}]"):
                continue
            dtype = jnp.dtype(dtype_name)
            llrs = jax.device_put(hard_to_llrs(cw_j, dtype))
            try:
                dec = _make_decoder(code, dtype, 50, None, impl)
                res = dec(llrs)
                _sync(res)
            except Exception as e:  # noqa: BLE001 - report and continue
                _skip(f"decode_ms[{impl},{dtype_name}]", name,
                      f"{type(e).__name__}: {e}", impl=impl)
                continue
            if not bool(np.asarray(res.success).all()):
                _skip(f"decode_ms[{impl},{dtype_name}]", name,
                      "failed the 3-bit-flip convergence assert", impl=impl)
                continue
            t = _timeit(lambda: dec(llrs), reps)
            record(f"decode_ms[{impl},{dtype_name}]", name, batch / t, "cw/s",
                   maxiters=50, impl=impl, dtype=dtype_name)

        # --- steady-state per-iteration rate -------------------------------
        # pure-noise LLRs (almost) never converge, so the batch runs the
        # fixed iteration budget: this tracks raw kernel quality, independent
        # of the early-exit behavior the 3-bit-flip scenario exercises.
        # A few lanes of a small code CAN lock onto some valid codeword
        # (TC128 has 2^64 of them); the while_loop still runs all ss_iters
        # unless the WHOLE batch converges, so the rate stays valid — we only
        # skip if convergence is widespread enough to question that.
        ss_iters = 20
        noise = jax.device_put(
            jnp.asarray(rng.standard_normal((batch, code.n)), jnp.float32))
        for impl, dtype_name in impls:
            if dtype_name not in ("float32", "bfloat16"):
                continue
            if not _want(f"ms_iter[{impl},{dtype_name}]"):
                continue
            dtype = jnp.dtype(dtype_name)
            noise_d = noise.astype(dtype)
            try:
                dec = _make_decoder(code, dtype, ss_iters, None, impl)
                res = dec(noise_d)
                _sync(res)
            except Exception as e:  # noqa: BLE001 - report and continue
                _skip(f"ms_iter[{impl},{dtype_name}]", name,
                      f"{type(e).__name__}: {e}", impl=impl)
                continue
            conv = float(np.asarray(res.success).mean())
            if conv > 0.05:
                _skip(f"ms_iter[{impl},{dtype_name}]", name,
                      f"noise converged {conv:.0%}", impl=impl)
                continue
            t = _timeit(lambda: dec(noise_d), reps)
            record(f"ms_iter[{impl},{dtype_name}]", name,
                   batch * ss_iters / t, "cw_iter/s",
                   maxiters=ss_iters, impl=impl, dtype=dtype_name)

        # --- table build (iter_paritychecks.rs analog) ---------------------
        if _want("table_build_edges_per_s"):
            decoder_tables.cache_clear()
            t0 = time.perf_counter()
            tabs = decoder_tables(code)
            t = time.perf_counter() - t0
            record("table_build_edges_per_s", name, tabs.n_edges / t, "edges/s")

    return results


def bench_two_stage(results, batch=16384, reps=3):
    """Two-stage decoders vs the plain layered kernel at two operating
    points: threshold (TM8192 @ 1.1 dB Eb/N0, the BER anchor point, broad
    iteration distribution) and post-waterfall (1.5 dB, sparse long-tail
    stragglers — the regime a two-stage design is supposed to win). Both
    sides are timed with a per-call blocking fetch (the two-stage host
    orchestration syncs internally, so pipelined timing would flatter the
    plain kernel only). Decode quality is recorded alongside throughput
    (failures per batch) since the designs trade speed vs rescue
    coverage. Conclusion (results.jsonl decode_threshold rows): the plain
    layered kernel's PER-TILE early exit already captures the adaptive
    iteration budget, and the extra sync + re-decode of the two-stage
    never pays for itself — documented as dominated."""
    import jax
    import jax.numpy as jnp

    from labrador_ldpc_tpu.channel.awgn import make_two_stage_decoder, noise_sigma
    from labrador_ldpc_tpu.codes.params import get_code
    from labrador_ldpc_tpu.ops.encoder import encode_bits
    from labrador_ldpc_tpu.ops.pallas_qc import make_ms_decoder_pallas_layered

    code = get_code("TM8192")
    rng = np.random.default_rng(7)
    data = rng.integers(0, 2, (batch, code.k), dtype=np.uint8)
    cw = np.asarray(encode_bits(code, jnp.asarray(data)))
    tx = 1.0 - 2.0 * cw.astype(np.float32)

    for snr in (1.1, 1.5):
        sigma = noise_sigma(snr, code, "ebn0")
        noisy = jax.device_put(jnp.asarray(
            tx + sigma * rng.standard_normal(tx.shape).astype(np.float32)))

        def run(label, dec):
            res = dec(noisy)  # compile + warm
            fails = int((~np.asarray(res.success)).sum())
            t0 = time.perf_counter()
            for _ in range(reps):
                res = dec(noisy)
                np.asarray(res.iterations)  # blocking fetch per call
            t = (time.perf_counter() - t0) / reps
            row = dict(bench=label, code="TM8192", value=round(batch / t, 1),
                       unit="cw/s", device=str(jax.devices()[0]), batch=batch,
                       snr_db=snr, failures=fails)
            results.append(row)
            print(f"{label:28} TM8192@{snr:<4} {batch / t:>12,.1f} cw/s "
                  f"({fails} failures)")

        run("decode_threshold[layered100]",
            make_ms_decoder_pallas_layered(code, jnp.float32, maxiters=100))
        run("decode_threshold[two_stage]",
            make_two_stage_decoder(code, maxiters_fast=25, maxiters_rescue=100,
                                   dtype=jnp.float32,
                                   fast_impl="pallas_layered",
                                   rescue_impl="pallas_qc"))
        # layered rescue: bit-identical quality to layered100 by
        # construction (the rescue reruns the SAME deterministic layered
        # algorithm from the same LLRs with the same budget), but the fast
        # pass caps easy tiles at 25 iterations and the 100-iteration tail
        # runs only on the gathered failures
        run("decode_threshold[two_stage_lay]",
            make_two_stage_decoder(code, maxiters_fast=25, maxiters_rescue=100,
                                   dtype=jnp.float32,
                                   fast_impl="pallas_layered",
                                   rescue_impl="pallas_layered"))


def bench_capi(codes, reps, results):
    from labrador_ldpc_tpu import capi
    from labrador_ldpc_tpu.codes.params import get_code

    rng = np.random.default_rng(0)
    for name in codes:
        code = get_code(name)
        data = rng.integers(0, 256, code.k // 8, dtype=np.uint8)
        cw = capi.copy_encode(code, data)
        if _want("capi_encode"):
            t = _timeit(lambda: capi.copy_encode(code, data), reps * 20)
            row = dict(bench="capi_encode", code=name, value=round(1 / t, 1),
                       unit="cw/s", device="cpu-scalar")
            results.append(row)
            print(f"{'capi_encode':28} {name:8} {1 / t:>14,.1f} cw/s")

        if _want("capi_decode_ms_f32"):
            rx = cw.copy()
            rx[0] ^= (1 << 7) | (1 << 5) | (1 << 3)
            llrs = capi.hard_to_llrs(code, rx, np.float32)
            ok, _, _ = capi.decode_ms(code, llrs, maxiters=50)
            assert ok
            t = _timeit(lambda: capi.decode_ms(code, llrs, maxiters=50), reps)
            row = dict(bench="capi_decode_ms_f32", code=name,
                       value=round(1 / t, 1), unit="cw/s",
                       device="cpu-scalar", maxiters=50)
            results.append(row)
            print(f"{'capi_decode_ms_f32':28} {name:8} {1 / t:>14,.1f} cw/s")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="TC128 + TM8192 only")
    ap.add_argument("--codes", default=None, help="comma-separated code list")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--filter", default="",
                    help="only RUN (and record) benches whose family name "
                         "(label up to '[') contains this substring, e.g. "
                         "'bf' or 'ms_iter'; combine with --impls to narrow "
                         "the ms benches")
    ap.add_argument("--impls", default=None,
                    help="comma-separated impl:dtype pairs (e.g. 'pallas_qc:int8')")
    ap.add_argument("--no-capi", action="store_true")
    ap.add_argument("--two-stage", action="store_true",
                    help="run the TM8192 threshold-SNR two-stage comparison")
    ap.add_argument("--strict", action="store_true",
                    help="exit nonzero if any PRODUCTION impl (the Pallas "
                         "kernels) SKIPs or fails its convergence/equality "
                         "assert — a sweep hole in a production path is a "
                         "regression, not a missing number")
    ap.add_argument("--parity-first", action="store_true",
                    help="run tools/tpu_parity.py --quick before the sweep "
                         "and record its exit code in the session log "
                         "(nonzero parity fails the run under --strict)")
    ap.add_argument("--out", default=str(Path(__file__).parent / "results.jsonl"))
    args = ap.parse_args()
    global RUN_FILTER
    RUN_FILTER = args.filter

    parity_rc = None
    if args.parity_first:
        import subprocess

        root = Path(__file__).resolve().parent.parent
        proc = subprocess.run(
            [sys.executable, str(root / "tools" / "tpu_parity.py"), "--quick"],
            capture_output=True, text=True,
        )
        parity_rc = proc.returncode
        tail = "\n".join(proc.stdout.splitlines()[-3:])
        print(f"tpu_parity --quick rc={parity_rc}\n{tail}")
        if parity_rc != 0:
            STRICT_VIOLATIONS.append(
                f"tpu_parity --quick exited {parity_rc}: {tail}"
            )

    from labrador_ldpc_tpu.codes.params import ALL_CODES

    if args.codes:
        codes = args.codes.split(",")
    elif args.quick:
        codes = ["TC128", "TM8192"]
    else:
        codes = [c.value for c in ALL_CODES]

    impls = [("ref", "float32"), ("qc", "float32"), ("qc", "bfloat16"),
             ("layered", "float32"), ("layered", "bfloat16"),
             ("qc_i8", "int8"), ("ref", "int8"),
             ("pallas_qc", "float32"), ("pallas_qc", "bfloat16"),
             ("pallas_layered", "float32"), ("pallas_layered", "bfloat16"),
             ("pallas_qc", "int8"), ("pallas_layered", "int8")]
    if args.impls:
        impls = [tuple(pair.split(":", 1)) for pair in args.impls.split(",")]

    t_start = time.time()
    stamp = {"ts": round(t_start, 1)}
    out_f = open(args.out, "a")
    written = 0

    class _Sink(list):
        """Appends each row to the JSONL file as it is measured, so an
        interrupted sweep (timeout, OOM, lost tunnel) keeps everything
        recorded up to that point."""

        def append(self, r):  # noqa: A003 - list interface
            super().append(r)
            nonlocal written
            if not _want(r["bench"]) and r["bench"] != "tpu_parity_quick":
                return
            out_f.write(json.dumps({**stamp, **r}) + "\n")
            out_f.flush()
            written += 1

    results = _Sink()
    try:
        if parity_rc is not None:
            results.append(dict(bench="tpu_parity_quick", code="ALL",
                                value=parity_rc, unit="exit_code"))
        if args.two_stage:
            bench_two_stage(results)
            return 0
        bench_all(codes, impls, args.batch, args.reps, results)
        if not args.no_capi and (_want("capi_encode")
                                 or _want("capi_decode_ms_f32")):
            bench_capi(codes, args.reps, results)
    finally:
        out_f.close()
        print(f"\n{written} results appended to {args.out}")
        if RUN_FILTER and written == 0:
            print(f"WARNING: --filter {RUN_FILTER!r} selected ZERO benches "
                  "(check the family/label spelling)")
    if STRICT_VIOLATIONS:
        print(f"\n{len(STRICT_VIOLATIONS)} production-path violation(s):")
        for v in STRICT_VIOLATIONS:
            print(f"  {v}")
        if args.strict:
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
