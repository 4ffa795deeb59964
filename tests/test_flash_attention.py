"""Flash-attention routing tests.

CPU: asserts the policy routes AWAY from the Pallas kernel (XLA einsum).
TPU (STT_TEST_PLATFORM=axon/tpu): numerics of flash vs einsum paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stt_tpu.models import whisper as W


def test_flash_not_applicable_on_cpu():
    assert jax.default_backend() == "cpu"
    assert not W._flash_applicable(1500)


def test_flash_policy_thresholds(monkeypatch):
    monkeypatch.setattr(W, "FLASH_ATTENTION", "off")
    assert not W._flash_applicable(4096)
    monkeypatch.setattr(W, "FLASH_ATTENTION", "auto")
    assert not W._flash_applicable(100)  # below min seq


@pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="needs a TPU device"
)
def test_flash_matches_einsum_on_tpu(monkeypatch):
    rng = np.random.default_rng(0)
    b, t, d, h = 2, 750, 512, 8
    q = jnp.asarray(rng.normal(0, 1, (b, t, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (b, t, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (b, t, d)), jnp.bfloat16)

    monkeypatch.setattr(W, "FLASH_ATTENTION", "off")
    ref = np.asarray(
        jax.jit(lambda q, k, v: W._attention(q, k, v, h))(q, k, v), np.float32
    )
    monkeypatch.setattr(W, "FLASH_ATTENTION", "auto")
    got = np.asarray(
        jax.jit(lambda q, k, v: W._attention(q, k, v, h))(q, k, v), np.float32
    )
    np.testing.assert_allclose(got, ref, atol=3e-2, rtol=3e-2)  # bf16
