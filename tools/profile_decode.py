#!/usr/bin/env python
"""Capture a TPU profiler trace of a decoder and print the top ops.

The aux-subsystem counterpart of "tracing/profiling" (SURVEY.md §5): wraps
`jax.profiler` around a decode workload and aggregates per-op device time
straight from the xplane protobuf (the tensorboard profile plugin in this
image is version-skewed, so we parse the trace directly).

    python tools/profile_decode.py --code TM8192 --impl qc --dtype bfloat16 \
        --batch 4096 --top 20
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", default="TM8192")
    ap.add_argument(
        "--impl",
        default="qc",
        choices=[
            # soft min-sum (routed through channel.awgn._make_decoder)
            "ref", "qc", "qc_i8", "qc_i16", "layered",
            "pallas_qc", "pallas_layered",
            # hard-decision bit-flip (ops.bitflip / ops.pallas_bf)
            "bf", "bf_qc", "bf_pallas",
        ],
    )
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--maxiters", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--trace-dir", default=None, help="keep the raw trace here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from labrador_ldpc_tpu.channel.awgn import _make_decoder
    from labrador_ldpc_tpu.codes.params import get_code
    from labrador_ldpc_tpu.ops.convert import hard_to_llrs
    from labrador_ldpc_tpu.ops.encoder import encode

    code = get_code(args.code)
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, (args.batch, code.k // 8), dtype=np.uint8)
    cw = np.array(encode(code, jnp.asarray(data)))
    cw[:, 0] ^= 0xA8
    if args.impl.startswith("bf"):
        # hard-decision family: input is the corrupted bit matrix
        from labrador_ldpc_tpu.ops.bitflip import make_bf_decoder, make_bf_decoder_qc
        from labrador_ldpc_tpu.ops.convert import unpack_bits
        from labrador_ldpc_tpu.ops.pallas_bf import make_bf_decoder_pallas

        mk = {"bf": make_bf_decoder, "bf_qc": make_bf_decoder_qc,
              "bf_pallas": make_bf_decoder_pallas}[args.impl]
        dec = mk(code, maxiters=args.maxiters)
        llrs = jax.device_put(unpack_bits(jnp.asarray(cw)))
    else:
        dtype = jnp.dtype(args.dtype)
        if args.impl.endswith(("_i8", "_i16")) or dtype.name.startswith("int"):
            from labrador_ldpc_tpu.channel.awgn import quantize_llrs

            if not dtype.name.startswith("int"):
                dtype = jnp.dtype("int8" if args.impl.endswith("_i8") else "int16")
            soft = hard_to_llrs(jnp.asarray(cw), jnp.float32)
            llrs = jax.device_put(quantize_llrs(soft, dtype))
        else:
            llrs = jax.device_put(hard_to_llrs(jnp.asarray(cw), dtype))
        dec = _make_decoder(code, dtype, args.maxiters, None, args.impl)
    jax.block_until_ready(dec(llrs))  # compile + warm

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="ldpc_trace_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(args.reps):
        jax.block_until_ready(dec(llrs))
    jax.profiler.stop_trace()

    # aggregate device-plane op durations
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore
    except ImportError:
        print(f"trace written to {trace_dir}; install tensorflow to parse here")
        return 0
    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not files:
        print(f"no xplane.pb found under {trace_dir}")
        return 1
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(files[-1], "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        agg: dict[str, float] = defaultdict(float)
        cnt: dict[str, int] = defaultdict(int)
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                agg[name] += ev.duration_ps / 1e9
                cnt[name] += 1
        total = sum(agg.values())
        print(f"\n== {plane.name} — {total:.1f} ms total over {args.reps} reps ==")
        for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]:
            print(f"  {ms:8.2f} ms  x{cnt[name]:<5} {name[:100]}")
    if not args.trace_dir:
        print(f"\n(raw trace kept at {trace_dir})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
