"""Fused narrow-head attention kernel: parity vs jax.nn.dot_product_attention
(interpret mode on CPU; the real kernel runs the same code path on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvfdiffusion_tpu.ops import fused_attention as fa


def _rand(shape, key):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize("lq,lk", [(64, 64), (64, 100), (32, 257)])
def test_fused_matches_xla(lq, lk):
    B, H, D = 2, 4, 32
    q = _rand((B, lq, H, D), 0)
    k = _rand((B, lk, H, D), 1)
    v = _rand((B, lk, H, D), 2)
    ref = jax.nn.dot_product_attention(q, k, v)
    out = fa.fused_attention(q, k, v, D**-0.5, jnp.float32, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_bf16_compute_close():
    B, H, D, L = 1, 2, 32, 64
    q, k, v = _rand((B, L, H, D), 3), _rand((B, L, H, D), 4), _rand((B, L, H, D), 5)
    ref = jax.nn.dot_product_attention(q, k, v)
    out = fa.fused_attention(q, k, v, D**-0.5, jnp.bfloat16, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_fused_vjp_matches_xla_grad():
    B, H, D, L = 1, 2, 16, 32
    q, k, v = _rand((B, L, H, D), 6), _rand((B, L, H, D), 7), _rand((B, L, H, D), 8)

    def loss_fused(q, k, v):
        return jnp.sum(fa.fused_attention(q, k, v, D**-0.5, jnp.float32, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(jax.nn.dot_product_attention(q, k, v) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_f, g_r, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4, err_msg=name
        )


def test_supports_predicate():
    assert fa.supports((3, 512, 16, 32), (3, 1370, 16, 32))
    assert not fa.supports((3, 513, 16, 32), (3, 64, 16, 32))  # Lq % 8
    assert not fa.supports((3, 512, 16, 32), (3, 8192, 16, 32))  # Lk too big
