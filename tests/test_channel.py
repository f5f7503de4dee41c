"""Channel harness tests: noise models, trial step counters, waterfall runner."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from labrador_ldpc_tpu.channel import make_trial_step, noise_sigma, waterfall
from labrador_ldpc_tpu.codes.params import get_code


def test_noise_sigma_models():
    # perftest model: sigma = 10^(-snr/10) (perftest/src/main.rs:15)
    assert noise_sigma(0.0) == pytest.approx(1.0)
    assert noise_sigma(10.0) == pytest.approx(0.1)
    # physical Eb/N0 model for rate-1/2: sigma^2 = 1/(2*R*10^(x/10))
    c = get_code("TC128")
    assert noise_sigma(0.0, c, "ebn0") == pytest.approx(1.0)
    with pytest.raises(ValueError):
        noise_sigma(1.0, c, "nope")


def test_trial_step_counts():
    c = get_code("TC128")
    step = make_trial_step(c, batch=32, maxiters=20)
    stats = step(jax.random.PRNGKey(0), jnp.float32(0.01))
    assert int(stats.trials) == 32 and int(stats.bit_errors) == 0


def test_waterfall_runner_small():
    out = io.StringIO()
    pts = waterfall(
        "TC128",
        snrs_db=[2.0],
        batch=64,
        maxiters=20,
        max_bits=64 * 64 * 2,  # two batches
        max_bit_errors=10**9,
        csv_out=out,
        seed=3,
    )
    assert len(pts) == 1
    p = pts[0]
    assert p.trials == 128 and p.bits == 128 * 64
    line = out.getvalue().strip()
    assert line.startswith("TC128,2.0,128,8192,")
    # BER at 2 dB (sigma=0.63) should be well below raw channel error rate
    raw_ber = 0.056  # Q(1/0.63)
    assert p.ber < raw_ber
