"""Sharding tests on the 8-virtual-device CPU mesh.

Validates the data-parallel design (SURVEY.md §5): batch sharded P('batch'),
identical results to single-device execution, and psum'd channel statistics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from labrador_ldpc_tpu.channel import make_trial_step, noise_sigma
from labrador_ldpc_tpu.codes.params import get_code
from labrador_ldpc_tpu.ops import convert, encoder, minsum
from labrador_ldpc_tpu.parallel import (
    make_batch_mesh,
    make_sharded_decoder,
    make_sharded_trial_step,
)


def test_virtual_mesh_present():
    assert len(jax.devices()) == 8


def test_sharded_decode_matches_single_device():
    c = get_code("TC256")
    mesh = make_batch_mesh()
    B = 32
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, (B, c.k // 8), dtype=np.uint8)
    cw = np.asarray(encoder.encode(c, jnp.asarray(data)))
    tx = 1.0 - 2.0 * np.unpackbits(cw, axis=1).astype(np.float32)
    llrs = tx + rng.normal(0, 0.5, tx.shape).astype(np.float32)

    res_1 = minsum.decode_ms(c, jnp.asarray(llrs), maxiters=30)
    sharded = make_sharded_decoder(c, mesh, jnp.float32, maxiters=30)
    res_8 = sharded(jnp.asarray(llrs))

    assert np.array_equal(np.asarray(res_1.bits), np.asarray(res_8.bits))
    assert np.array_equal(np.asarray(res_1.success), np.asarray(res_8.success))
    # sharded input really is distributed
    assert len(sharded(jnp.asarray(llrs)).bits.sharding.device_set) >= 1


def test_sharded_trial_step_stats():
    c = get_code("TC128")
    mesh = make_batch_mesh()
    step = make_sharded_trial_step(c, global_batch=64, mesh=mesh, maxiters=20)
    sigma = noise_sigma(10.0, c, "perftest")  # essentially noiseless
    stats = step(jax.random.PRNGKey(0), jnp.float32(sigma))
    assert int(stats.trials) == 64
    assert int(stats.bit_errors) == 0
    assert int(stats.frame_errors) == 0
    assert int(stats.decode_failures) == 0

    # heavy noise: plenty of errors, counters consistent
    stats = step(jax.random.PRNGKey(1), jnp.float32(noise_sigma(-3.0, c, "perftest")))
    assert int(stats.bit_errors) > 0
    assert 0 < int(stats.frame_errors) <= 64


def test_unsharded_trial_step_matches_sharded():
    """Same key + sigma -> identical global counters on 1 vs 8 devices
    (partitionable threefry makes RNG placement-invariant)."""
    c = get_code("TC128")
    mesh = make_batch_mesh()
    sigma = jnp.float32(noise_sigma(1.0, c, "perftest"))
    key = jax.random.PRNGKey(42)
    s1 = make_trial_step(c, 64, 20)(key, sigma)
    s8 = make_sharded_trial_step(c, 64, mesh, 20)(key, sigma)
    for a, b in zip(s1, s8):
        assert int(a) == int(b)


@pytest.mark.parametrize(
    "impl,dtype",
    [("layered", "float32"), ("qc_i8", "int8"), ("qc", "int16"), ("ref", "float32")],
)
def test_sharded_matches_unsharded_all_impls(impl, dtype):
    """Mesh-vs-single equality for every production impl/dtype combination
    (VERDICT r1 item 6): the sharded harness must honor `impl` and the int
    quantizer, not silently fall back to the float qc path."""
    c = get_code("TC128")
    mesh = make_batch_mesh()
    sigma = jnp.float32(noise_sigma(1.2, c, "perftest"))
    key = jax.random.PRNGKey(7)
    s1 = make_trial_step(c, 64, 20, dtype, None, impl)(key, sigma)
    s8 = make_sharded_trial_step(c, 64, mesh, 20, dtype, None, impl)(key, sigma)
    for a, b in zip(s1, s8):
        assert int(a) == int(b)


def test_sharded_decoder_impl_param():
    """make_sharded_decoder routes impl/dtype like the unsharded factories."""
    from labrador_ldpc_tpu.channel import quantize_llrs
    from labrador_ldpc_tpu.ops.qc_minsum import make_ms_decoder_qc_int

    c = get_code("TC256")
    mesh = make_batch_mesh()
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, (16, c.k // 8), dtype=np.uint8)
    cw = np.asarray(encoder.encode(c, jnp.asarray(data)))
    tx = 1.0 - 2.0 * np.unpackbits(cw, axis=1).astype(np.float32)
    noisy = tx + rng.normal(0, 0.6, tx.shape).astype(np.float32)
    llrs = quantize_llrs(jnp.asarray(noisy), jnp.int8)

    res_1 = make_ms_decoder_qc_int(c, jnp.int8, 30)(llrs)
    res_8 = make_sharded_decoder(c, mesh, jnp.int8, maxiters=30, impl="qc")(llrs)
    assert np.array_equal(np.asarray(res_1.bits), np.asarray(res_8.bits))
    assert np.array_equal(np.asarray(res_1.success), np.asarray(res_8.success))


def test_shard_map_pallas_decoder_matches_unsharded():
    """Pallas kernels are opaque to the GSPMD partitioner, so the mesh
    paths wrap them in jax.shard_map (channel.awgn.shard_map_decoder).
    Validate the exact production wrapper on the 8-CPU mesh with the
    interpret-mode kernel: per-shard decode == unsharded decode."""
    from labrador_ldpc_tpu.channel.awgn import shard_map_decoder
    from labrador_ldpc_tpu.ops.pallas_qc import make_ms_decoder_pallas_layered

    c = get_code("TM1280")
    mesh = make_batch_mesh()
    rng = np.random.default_rng(13)
    data = rng.integers(0, 256, (16, c.k // 8), dtype=np.uint8)
    cw = np.asarray(encoder.encode(c, jnp.asarray(data)))
    tx = 1.0 - 2.0 * np.unpackbits(cw, axis=1).astype(np.float32)
    llrs = jnp.asarray(tx + rng.normal(0, 0.5, tx.shape).astype(np.float32))

    dec = make_ms_decoder_pallas_layered(c, jnp.float32, maxiters=10,
                                         batch_tile=2, interpret=True)
    res_1 = dec(llrs)
    res_8 = jax.jit(shard_map_decoder(dec, mesh))(llrs)
    assert np.array_equal(np.asarray(res_1.bits), np.asarray(res_8.bits))
    assert np.array_equal(np.asarray(res_1.success), np.asarray(res_8.success))
    assert np.array_equal(np.asarray(res_1.iterations), np.asarray(res_8.iterations))
