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
    assert fa.supports((2, 4096, 16, 64), (2, 1370, 16, 64))  # SLat cross
    assert fa.supports((2, 4096, 16, 64), (2, 4096, 16, 64))  # SLat self
    assert fa.supports((32, 1374, 16, 64), (32, 1374, 16, 64))  # DINOv2
    assert not fa.supports((3, 64, 16, 32), (3, 512, 16, 32))  # Lq tiny
    assert not fa.supports((3, 512, 16, 32), (3, 8192, 16, 32))  # Lk too big


def test_ragged_lq_matches_xla():
    """Non-multiple-of-8 Lq (DINOv2's 1374-token shape, scaled down)."""
    B, H, D = 1, 4, 32
    q = _rand((B, 173, H, D), 53)
    k = _rand((B, 173, H, D), 54)
    v = _rand((B, 173, H, D), 55)
    ref = jax.nn.dot_product_attention(q, k, v)
    out = fa.fused_attention(q, k, v, D**-0.5, jnp.float32, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_gridded_lq_matches_xla():
    """Lq above one row block: the Lq grid axis + output un-pad must
    reproduce single-block results ( _lq_block(2048, 128) == 1024 -> 2 row
    blocks; lq=1032 additionally exercises the Lq padding)."""
    B, H, D = 1, 4, 32
    for lq in (2048, 1032):
        q = _rand((B, lq, H, D), 50)
        k = _rand((B, 128, H, D), 51)
        v = _rand((B, 128, H, D), 52)
        ref = jax.nn.dot_product_attention(q, k, v)
        out = fa.fused_attention(q, k, v, D**-0.5, jnp.float32, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_kv_bias_matches_masked_xla():
    """kv_bias as ragged-validity mask: -inf columns drop keys exactly like
    a boolean kv mask on the XLA path."""
    B, H, D, LQ, LK = 2, 4, 32, 64, 100
    q = _rand((B, LQ, H, D), 60)
    k = _rand((B, LK, H, D), 61)
    v = _rand((B, LK, H, D), 62)
    valid = jax.random.uniform(jax.random.PRNGKey(63), (B, LK)) > 0.3
    valid = valid.at[:, 0].set(True)
    mask = valid[:, None, None, :]
    ref = jax.nn.dot_product_attention(q, k, v, mask=mask)
    bias = jnp.where(valid, 0.0, -jnp.inf).astype(jnp.float32)
    out = fa.fused_attention(q, k, v, D**-0.5, jnp.float32, True,
                             kv_bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_kv_bias_fully_masked_row_is_finite():
    B, H, D, LQ, LK = 1, 2, 32, 32, 64
    q = _rand((B, LQ, H, D), 64)
    k = _rand((B, LK, H, D), 65)
    v = _rand((B, LK, H, D), 66)
    bias = jnp.full((B, LK), -jnp.inf, jnp.float32)
    out = fa.fused_attention(q, k, v, D**-0.5, jnp.float32, True,
                             kv_bias=bias)
    assert bool(jnp.isfinite(out).all())


def test_kv_bias_vjp_matches_masked_grad():
    B, H, D, LQ, LK = 1, 2, 16, 32, 48
    q = _rand((B, LQ, H, D), 70)
    k = _rand((B, LK, H, D), 71)
    v = _rand((B, LK, H, D), 72)
    valid = jax.random.uniform(jax.random.PRNGKey(73), (B, LK)) > 0.4
    valid = valid.at[:, 0].set(True)
    bias = jnp.where(valid, 0.0, -jnp.inf).astype(jnp.float32)

    def loss_fused(q, k, v):
        return jnp.sum(fa.fused_attention(
            q, k, v, D**-0.5, jnp.float32, True, kv_bias=bias) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(jax.nn.dot_product_attention(
            q, k, v, mask=valid[:, None, None, :]) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_f, g_r, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4, err_msg=name
        )


def test_segment_packed_matches_per_row():
    """Sequence-packing G tiny attentions into one row with segment_size must
    reproduce per-row attention exactly (block-diagonal masking)."""
    B, T, H, D = 8, 32, 4, 32
    q = _rand((B, T, H, D), 10)
    k = _rand((B, T, H, D), 11)
    v = _rand((B, T, H, D), 12)
    ref = jax.nn.dot_product_attention(q, k, v)

    g = 4  # pack 4 rows -> length 128
    pk = lambda a: a.reshape(B // g, g * T, H, D)
    out = fa.fused_attention(pk(q), pk(k), pk(v), D**-0.5, jnp.float32, True, T)
    np.testing.assert_allclose(
        np.asarray(out.reshape(B, T, H, D)), np.asarray(ref),
        atol=2e-5, rtol=2e-5,
    )


def test_segment_packed_vjp_matches_per_row():
    B, T, H, D = 4, 16, 2, 32
    q = _rand((B, T, H, D), 20)
    k = _rand((B, T, H, D), 21)
    v = _rand((B, T, H, D), 22)
    g = 2
    pk = lambda a: a.reshape(B // g, g * T, H, D)

    def loss_packed(q, k, v):
        o = fa.fused_attention(pk(q), pk(k), pk(v), D**-0.5, jnp.float32, True, T)
        return jnp.sum(o**2)

    def loss_ref(q, k, v):
        return jnp.sum(jax.nn.dot_product_attention(q, k, v) ** 2)

    gp = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-5)


def test_dispatch_packs_small_self_attention():
    """scaled_dot_product_attention packs small-L calls on TPU; on CPU it
    falls through — here we just check numerical equivalence of the packed
    path via the kernel's interpret mode against the dispatch result."""
    from gvfdiffusion_tpu.nn.attention import scaled_dot_product_attention

    B, T, H, D = 16, 32, 4, 32
    q = _rand((B, T, H, D), 30)
    k = _rand((B, T, H, D), 31)
    v = _rand((B, T, H, D), 32)
    ref = scaled_dot_product_attention(q, k, v)  # CPU: xla path
    pk = lambda a: a.reshape(1, B * T, H, D)
    packed = fa.fused_attention(pk(q), pk(k), pk(v), D**-0.5,
                                jnp.float32, True, T)
    np.testing.assert_allclose(np.asarray(packed.reshape(B, T, H, D)),
                               np.asarray(ref), atol=2e-5, rtol=2e-5)


def _rand4(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32))


def test_temporal_kernel_matches_einsum():
    """temporal_attention (interpret mode) vs the batched-einsum reference:
    per-(b,n,h) attention over T in native [B,T,N,H,D] layout."""
    B, T, N, H, D = 2, 8, 8, 4, 32
    q = _rand4((B, T, N, H, D), 40)
    k = _rand4((B, T, N, H, D), 41)
    v = _rand4((B, T, N, H, D), 42)
    scale = D ** -0.5
    s = jnp.einsum("btnhd,bsnhd->bnhts", q, k) * scale
    w = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("bnhts,bsnhd->btnhd", w, v)
    got = fa.temporal_attention(q, k, v, scale, jnp.float32, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_temporal_kernel_vjp_matches_einsum_grad():
    B, T, N, H, D = 1, 8, 8, 4, 32
    q = _rand4((B, T, N, H, D), 43)
    k = _rand4((B, T, N, H, D), 44)
    v = _rand4((B, T, N, H, D), 45)
    scale = D ** -0.5

    def ref_fn(q, k, v):
        s = jnp.einsum("btnhd,bsnhd->bnhts", q, k) * scale
        w = jax.nn.softmax(s, axis=-1)
        return jnp.sum(jnp.einsum("bnhts,bsnhd->btnhd", w, v) ** 2)

    def ker_fn(q, k, v):
        return jnp.sum(
            fa.temporal_attention(q, k, v, scale, jnp.float32, True) ** 2)

    g_ref = jax.grad(ref_fn, argnums=(0, 1, 2))(q, k, v)
    g_ker = jax.grad(ker_fn, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ker, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-5)


def test_temporal_supports_predicate():
    assert fa.temporal_supports((1, 32, 512, 16, 32))
    assert fa.temporal_supports((1, 32, 510, 16, 32))  # NC adapts (510 % 2)
    assert not fa.temporal_supports((1, 32, 512, 3, 32))   # lanes % 128


# ---------------------------------------------------------------------------
# int8 quantized kernels (VERDICT r3 item 4: the last denoise lever)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("quant,tol", [("qk", 0.03), ("qk+av", 0.06)])
def test_quant_int8_error_bound(quant, tol):
    """int8 QK (and P.V) vs the fp32 reference: per-head dynamic scales keep
    the attention output within a few percent of full precision at trained-
    transformer logit scales (the parity-risk bound VERDICT asks for)."""
    B, H, D, Lq, Lk = 1, 4, 32, 128, 256
    q = _rand((B, Lq, H, D), 20) * 0.5
    k = _rand((B, Lk, H, D), 21) * 0.5
    v = _rand((B, Lk, H, D), 22)
    ref = jax.nn.dot_product_attention(q, k, v)
    out = fa.fused_attention(q, k, v, D**-0.5, jnp.float32, True, quant=quant)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    rel = err.max() / np.abs(np.asarray(ref)).max()
    print(f"int8 {quant}: max_abs={err.max():.4f} rel={rel:.4f}")
    assert rel < tol, f"int8 {quant} relative error {rel:.4f}"


def test_quant_int8_diffuse_rows_survive():
    """Near-uniform attention rows (every weight ~1/Lk) must not collapse
    under P quantization — the row-max normalization guarantees the max
    element quantizes to 127."""
    B, H, D, L = 1, 2, 32, 256
    q = jnp.zeros((B, L, H, D))  # all logits equal -> exactly uniform P
    k = _rand((B, L, H, D), 23)
    v = _rand((B, L, H, D), 24)
    ref = jnp.mean(v, axis=1, keepdims=True) * jnp.ones((1, L, 1, 1))
    out = fa.fused_attention(q, k, v, D**-0.5, jnp.float32, True,
                             quant="qk+av")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_quant_int8_kv_bias_mask():
    """Ragged kv masking still holds under quantization."""
    B, H, D, Lq, Lk, valid = 1, 2, 32, 64, 128, 70
    q = _rand((B, Lq, H, D), 25)
    k = _rand((B, Lk, H, D), 26)
    v = _rand((B, Lk, H, D), 27)
    bias = jnp.where(jnp.arange(Lk) < valid, 0.0, -jnp.inf)[None]
    ref = jax.nn.dot_product_attention(q, k[:, :valid], v[:, :valid])
    for quant in ("qk", "qk+av"):
        out = fa.fused_attention(q, k, v, D**-0.5, jnp.float32, True,
                                 kv_bias=bias, quant=quant)
        rel = (np.abs(np.asarray(out) - np.asarray(ref)).max()
               / np.abs(np.asarray(ref)).max())
        assert rel < 0.06, f"{quant}: {rel}"
