"""Second-round probes: ILP, tile size, roll axis, VMEM ceiling."""

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


def bench(fn, x, rep=20):
    fn(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(rep):
        out = fn(x)
    out.block_until_ready()
    return (time.perf_counter() - t0) / rep


def probe_vpu_ilp(B, M, chains=4):
    """4 independent op chains -> how much ILP does the VPU exploit?"""
    K = 500
    OPS = 12 * chains

    def kernel(x_ref, o_ref):
        def body(i, accs):
            outs = []
            for a0 in accs:
                a = a0 * 1.0001 + 0.5
                b = jnp.abs(a) - 0.25
                c = jnp.minimum(a, b)
                d = jnp.where(b < a, c + 1.0, c - 1.0)
                e = jnp.maximum(d, -d)
                outs.append(d + e * 0.5)
            return tuple(outs)

        init = tuple(x_ref[:] + float(i) for i in range(chains))
        res = jax.lax.fori_loop(0, K, body, init)
        acc = res[0]
        for r in res[1:]:
            acc = acc + r
        o_ref[:] = acc

    x = jnp.ones((B, M), jnp.float32)
    fn = jax.jit(
        pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, M), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    dt = bench(fn, x)
    print(
        f"vpu ilp{chains} ({B},{M}): {dt*1e3:.2f} ms -> "
        f"{B*M*K*OPS/dt/1e12:.2f} Tops/s f32"
    )


def probe_roll_ilp(B, M, axis):
    """4 independent rolls per step."""
    K = 500

    def kernel(x_ref, o_ref):
        def body(i, accs):
            return tuple(pltpu.roll(a, 7 + j, axis=axis) for j, a in enumerate(accs))

        init = tuple(x_ref[:] + float(i) for i in range(4))
        res = jax.lax.fori_loop(0, K, body, init)
        o_ref[:] = res[0] + res[1] + res[2] + res[3]

    x = jnp.ones((B, M), jnp.float32)
    fn = jax.jit(
        pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, M), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    dt = bench(fn, x)
    rolls = K * 4
    print(
        f"roll axis={axis} ({B},{M}): {dt*1e3:.2f} ms -> "
        f"{rolls/dt/1e6:.2f} M rolls/s, {rolls*B*M*4*2/dt/1e12:.2f} TB/s"
    )


def probe_vmem_ceiling():
    M = 2048
    for mb in (48, 64, 96, 110, 128):
        rows = mb * 1024 * 1024 // (M * 4)

        def kernel(x_ref, o_ref, scratch):
            scratch[0, :] = x_ref[0, :]
            o_ref[:] = x_ref[:] + scratch[0, 0]

        try:
            fn = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, M), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((rows, M), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=(mb + 4) * 1024 * 1024
                ),
            )
            np.asarray(fn(jnp.ones((8, M), jnp.float32)))
            print(f"vmem scratch {mb} MB: OK")
        except Exception as e:
            print(f"vmem scratch {mb} MB: FAIL ({str(e)[:100]})")
            break


if __name__ == "__main__":
    print("devices:", jax.devices())
    for B in (32, 128, 256):
        probe_vpu_ilp(B, 2048)
    probe_roll_ilp(32, 2048, axis=1)
    probe_roll_ilp(128, 2048, axis=1)
    probe_roll_ilp(2048, 128, axis=0)
    probe_roll_ilp(2048, 256, axis=0)
    probe_vmem_ceiling()
