"""Hardware probes for the VMEM-resident min-sum kernel design (round 2).

Answers three questions on the real v5e before committing to a design:
  1. does pltpu.roll with a TRACED shift along lanes compile/run for f32?
  2. what elementwise f32 throughput does a fori-loop VPU kernel sustain?
  3. how much VMEM scratch can one kernel invocation actually hold?

Run: timeout 570 python tools/probe_pallas.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, M = 32, 2048


def probe_dynamic_roll():
    """Traced-shift lane roll: whole-block and quarter rolls."""
    def kernel(shift_ref, x_ref, o_ref):
        s = shift_ref[0]
        y = pltpu.roll(x_ref[:], -s, axis=1)
        q = M // 4
        parts = [pltpu.roll(y[:, t * q : (t + 1) * q], s + t, axis=1) for t in range(4)]
        o_ref[:] = jnp.concatenate(parts, axis=1)

    x = jnp.arange(B * M, dtype=jnp.float32).reshape(B, M)
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, M), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )
    shift = jnp.array([5], jnp.int32)
    out = np.asarray(fn(shift, x))
    # reference semantics
    y = np.roll(np.asarray(x), -5, axis=1)
    q = M // 4
    ref = np.concatenate(
        [np.roll(y[:, t * q : (t + 1) * q], 5 + t, axis=1) for t in range(4)], axis=1
    )
    ok = np.array_equal(out, ref)
    print(f"dynamic_roll: {'OK' if ok else 'MISMATCH'}")
    return ok


def probe_vpu_throughput():
    """Sustained f32 elementwise rate inside a fori loop (ops counted)."""
    K = 2000  # fori iterations
    OPS_PER_ITER = 12  # adds/muls/selects below

    def kernel(x_ref, o_ref):
        def body(i, acc):
            a = acc * 1.0001 + 0.5
            b = jnp.abs(a) - 0.25
            c = jnp.minimum(a, b)
            d = jnp.where(b < a, c + 1.0, c - 1.0)
            e = jnp.maximum(d, -d)
            f = d + e * 0.5
            return f

        o_ref[:] = jax.lax.fori_loop(0, K, body, x_ref[:])

    x = jnp.ones((B, M), jnp.float32)
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, M), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    jfn = jax.jit(fn)
    jfn(x).block_until_ready()
    t0 = time.perf_counter()
    REP = 20
    for _ in range(REP):
        out = jfn(x)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / REP
    total_ops = B * M * K * OPS_PER_ITER
    print(f"vpu elementwise: {dt*1e3:.2f} ms/call -> {total_ops/dt/1e12:.2f} Tops/s f32")


def probe_roll_throughput():
    """Sustained lane-roll (static shift) copy rate on (B, M) f32."""
    K = 2000

    def kernel(x_ref, o_ref):
        def body(i, acc):
            return pltpu.roll(acc, 7, axis=1) + 1.0

        o_ref[:] = jax.lax.fori_loop(0, K, body, x_ref[:])

    x = jnp.ones((B, M), jnp.float32)
    jfn = jax.jit(
        pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, M), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    jfn(x).block_until_ready()
    t0 = time.perf_counter()
    REP = 20
    for _ in range(REP):
        out = jfn(x)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / REP
    bytes_moved = B * M * 4 * K * 2  # read+write per roll
    print(
        f"lane roll: {dt*1e3:.2f} ms/call -> {K/dt/1e6:.2f} M rolls/s, "
        f"{bytes_moved/dt/1e12:.2f} TB/s VMEM"
    )


def probe_vmem_budget():
    """Largest scratch allocation that compiles + runs."""
    for mb in (8, 12, 14, 16, 20, 24, 32):
        rows = mb * 1024 * 1024 // (M * 4)

        def kernel(x_ref, o_ref, scratch):
            scratch[0, :] = x_ref[0, :]
            o_ref[:] = x_ref[:] + scratch[0, 0]

        try:
            fn = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((B, M), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((rows, M), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=(mb + 4) * 1024 * 1024
                ),
            )
            np.asarray(fn(jnp.ones((B, M), jnp.float32)))
            print(f"vmem scratch {mb} MB: OK")
        except Exception as e:
            print(f"vmem scratch {mb} MB: FAIL ({type(e).__name__}: {str(e)[:120]})")
            break


if __name__ == "__main__":
    print("devices:", jax.devices())
    probe_dynamic_roll()
    probe_vpu_throughput()
    probe_roll_throughput()
    probe_vmem_budget()
