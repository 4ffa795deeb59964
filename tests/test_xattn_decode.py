"""Cross-attention decode kernel: routing policy + numerics.

CPU: the policy must route AWAY from the Pallas kernel (einsum path),
and the kernel's interpret mode must match the einsum reference.
TPU: compiled-kernel numerics vs einsum (run on real devices only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stt_tpu.models import whisper as W
from stt_tpu.ops.pallas.xattn_decode import xattn_decode


def _inputs(dtype, b=3, h=4, ta=40, dh=16, seed=0):
    rng = jax.random.PRNGKey(seed)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (b, h, dh), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, ta, dh), jnp.float32).astype(dtype)
    v = jax.random.normal(kv, (b, h, ta, dh), jnp.float32).astype(dtype)
    return q, k, v


def test_policy_off_on_cpu():
    assert jax.default_backend() == "cpu"
    assert not W._xattn_kernel_applicable()


def test_policy_env_off(monkeypatch):
    monkeypatch.setattr(W, "XATTN_KERNEL", "off")
    assert not W._xattn_kernel_applicable()


@pytest.mark.parametrize("variant", ["mxu", "vpu", "mm", "mmd"])
@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float8_e4m3fn])
def test_interpret_matches_einsum(dtype, variant):
    """Interpret-mode kernel vs the _attn_cached einsum reference."""
    q, k, v = _inputs(dtype)
    out = np.asarray(xattn_decode(q, k, v, interpret=True,
                                  variant=variant))
    ref = np.asarray(
        W._attn_cached(q[:, :, None, :], k, v)[:, :, 0, :]
    )
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("rows", [1, 2, 4])
def test_interpret_mm_rows_per_block_override(rows):
    """Explicit G override (the A/B harness `mm@G` sweep) stays
    parity-exact with the einsum reference; a non-divisor raises."""
    q, k, v = _inputs(jnp.bfloat16, b=4)
    out = np.asarray(xattn_decode(q, k, v, interpret=True, variant="mm",
                                  rows_per_block=rows))
    ref = np.asarray(
        W._attn_cached(q[:, :, None, :], k, v)[:, :, 0, :]
    )
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)
    with pytest.raises(ValueError):
        xattn_decode(q, k, v, interpret=True, variant="mm",
                     rows_per_block=3)


def test_vpu_row_group_divides_batch():
    """Row-group picker returns a divisor of B under the VMEM budget
    for the serving shapes (64 rows x 12 heads x 500 frames)."""
    from stt_tpu.ops.pallas.xattn_decode import _row_group

    for b in (1, 2, 4, 8, 16, 32, 64):
        g = _row_group(b, 12, 500, 64, 1)
        assert b % g == 0 and g >= 1
        assert 2 * 2 * g * 12 * 500 * 64 * 1 <= 16 * 1024 * 1024


@pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="needs a TPU device"
)
@pytest.mark.parametrize("variant", ["mxu", "vpu", "mm", "mmd"])
@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float8_e4m3fn])
def test_compiled_matches_einsum_on_tpu(dtype, variant):
    q, k, v = _inputs(dtype, b=4, h=12, ta=500, dh=64)
    out = np.asarray(xattn_decode(q, k, v, variant=variant))
    ref = np.asarray(
        W._attn_cached(q[:, :, None, :], k, v)[:, :, 0, :]
    )
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)
