"""Fused sublayer kernels (ops/fused_sublayer.py) vs their pure-XLA
references (interpret mode on CPU; the real kernels run the same code path
on TPU). Covers the DiT hot-loop fusions: self, temporal, dual-cross, MLP —
plus the custom_vjp gradients used if a fused path ever runs under grad."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvfdiffusion_tpu.ops import fused_sublayer as fs

B, L, C, H = 2, 128, 256, 8  # D = 32
T, N = 8, 32


def _mk(key, *shape, scale=1.0):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(
        jnp.float32)


def _self_args(rms=True, seg=0):
    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    x = _mk(ks[0], B, L, C)
    sh = _mk(ks[1], B, C, scale=0.2)
    sc = _mk(ks[2], B, C, scale=0.2)
    g = _mk(ks[3], B, C, scale=0.5)
    wqkv = _mk(ks[4], C, 3 * C, scale=0.05)
    bqkv = _mk(ks[5], 3 * C, scale=0.05)
    qg = jnp.abs(_mk(ks[6], C, scale=0.3)) + 1.0
    kg = jnp.abs(_mk(ks[7], C, scale=0.3)) + 1.0
    wo = _mk(ks[8], C, C, scale=0.05)
    bo = _mk(ks[9], C, scale=0.05)
    return (x, sh, sc, g, wqkv, bqkv, qg, kg, wo, bo)


@pytest.mark.parametrize("rms", [True, False])
def test_self_sublayer_matches_reference(rms):
    args = _self_args()
    ref = fs.self_sublayer_reference(*args, num_heads=H, rms=rms,
                                     compute_dtype=jnp.float32)
    out = fs.fused_self_sublayer(*args, num_heads=H, rms=rms,
                                 compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_self_sublayer_quant_qk():
    """int8-QK self kernel (GVF_SELF_QUANT): per-(cell, head) max-abs scales
    on both operands of the QK dot; drift vs the float path bounded by int8
    quantization error on the scores."""
    args = _self_args()
    ref = fs.self_sublayer_reference(*args, num_heads=H, rms=True,
                                     compute_dtype=jnp.float32)
    out = fs.fused_self_sublayer(*args, num_heads=H, rms=True,
                                 compute_dtype=jnp.float32, interpret=True,
                                 quant_qk=True)
    rel = jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref)
    assert float(rel) < 0.02, float(rel)


def test_temporal_sublayer_quant_qk():
    ks = jax.random.split(jax.random.PRNGKey(5), 12)
    x = _mk(ks[0], B, T, N, C)
    sh = _mk(ks[1], B, C, scale=0.2)
    sc = _mk(ks[2], B, C, scale=0.2)
    g = _mk(ks[3], B, C, scale=0.5)
    wqkv = _mk(ks[4], C, 3 * C, scale=0.05)
    bqkv = _mk(ks[5], 3 * C, scale=0.05)
    qg = jnp.abs(_mk(ks[6], C, scale=0.3)) + 1.0
    kg = jnp.abs(_mk(ks[7], C, scale=0.3)) + 1.0
    wo = _mk(ks[8], C, C, scale=0.05)
    bo = _mk(ks[9], C, scale=0.05)
    args = (x, sh, sc, g, wqkv, bqkv, qg, kg, wo, bo)
    ref = fs.temporal_sublayer_reference(*args, num_heads=H, rms=True,
                                         compute_dtype=jnp.float32)
    out = fs.fused_temporal_sublayer(*args, num_heads=H, rms=True,
                                     compute_dtype=jnp.float32,
                                     interpret=True, quant_qk=True)
    rel = jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref)
    assert float(rel) < 0.02, float(rel)


def test_self_sublayer_segmented():
    args = _self_args()
    ref = fs.self_sublayer_reference(*args, num_heads=H, rms=True,
                                     compute_dtype=jnp.float32, seg=16)
    out = fs.fused_self_sublayer(*args, num_heads=H, rms=True, seg=16,
                                 compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_self_sublayer_mod_repeat():
    x, sh, sc, g, *rest = _self_args()
    x2 = jnp.concatenate([x, x * 0.5], axis=0)  # B=4 cells, 2 mod rows
    out = fs.fused_self_sublayer(x2, sh, sc, g, *rest, num_heads=H,
                                 rms=True, mod_repeat=2,
                                 compute_dtype=jnp.float32, interpret=True)
    ref = fs.self_sublayer_reference(
        x2, jnp.repeat(sh, 2, 0), jnp.repeat(sc, 2, 0), jnp.repeat(g, 2, 0),
        *rest, num_heads=H, rms=True, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_self_sublayer_grad_matches_reference():
    args = _self_args()

    def loss_fused(x, wqkv, gate):
        y = fs.fused_self_sublayer(x, args[1], args[2], gate, wqkv, args[5],
                                   args[6], args[7], args[8], args[9],
                                   num_heads=H, rms=True,
                                   compute_dtype=jnp.float32, interpret=True)
        return jnp.sum(y * y)

    def loss_ref(x, wqkv, gate):
        y = fs.self_sublayer_reference(x, args[1], args[2], gate, wqkv,
                                       args[5], args[6], args[7], args[8],
                                       args[9], num_heads=H, rms=True,
                                       compute_dtype=jnp.float32)
        return jnp.sum(y * y)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(args[0], args[4], args[3])
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(args[0], args[4], args[3])
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_temporal_sublayer_matches_reference():
    ks = jax.random.split(jax.random.PRNGKey(1), 12)
    x = _mk(ks[0], B, T, N, C)
    sh = _mk(ks[1], B, C, scale=0.2)
    sc = _mk(ks[2], B, C, scale=0.2)
    g = _mk(ks[3], B, C, scale=0.5)
    wqkv = _mk(ks[4], C, 3 * C, scale=0.05)
    bqkv = _mk(ks[5], 3 * C, scale=0.05)
    qg = jnp.abs(_mk(ks[6], C, scale=0.3)) + 1.0
    kg = jnp.abs(_mk(ks[7], C, scale=0.3)) + 1.0
    wo = _mk(ks[8], C, C, scale=0.05)
    bo = _mk(ks[9], C, scale=0.05)
    args = (x, sh, sc, g, wqkv, bqkv, qg, kg, wo, bo)
    ref = fs.temporal_sublayer_reference(*args, num_heads=H, rms=True,
                                         compute_dtype=jnp.float32)
    out = fs.fused_temporal_sublayer(*args, num_heads=H, rms=True,
                                     compute_dtype=jnp.float32,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def _cross_args():
    ks = jax.random.split(jax.random.PRNGKey(2), 20)
    x = _mk(ks[0], B, L, C)

    def pgroup(i):
        return (
            jnp.abs(_mk(ks[i], C, scale=0.2)) + 0.8,   # norm scale
            _mk(ks[i + 1], C, scale=0.1),               # norm bias
            _mk(ks[i + 2], C, C, scale=0.05),           # wq
            _mk(ks[i + 3], C, scale=0.05),              # bq
            jnp.abs(_mk(ks[i + 4], C, scale=0.3)) + 1.0,  # q gamma lanes
            _mk(ks[i + 5], C, C, scale=0.05),           # wo
            _mk(ks[i + 6], C, scale=0.05),              # bo
        )

    p1, p2 = pgroup(1), pgroup(8)
    kv1 = (_mk(ks[15], B, 200, C, scale=0.5), _mk(ks[16], B, 200, C,
                                                  scale=0.5))
    kv2 = (_mk(ks[17], B, 128, C, scale=0.5), _mk(ks[18], B, 128, C,
                                                  scale=0.5))
    return x, p1, kv1, p2, kv2


@pytest.mark.parametrize("rms", [False, True])
def test_cross_sublayer_matches_reference(rms):
    x, p1, kv1, p2, kv2 = _cross_args()
    ref = fs.cross_sublayer_reference(x, p1, kv1, p2, kv2, num_heads=H,
                                      rms=rms, compute_dtype=jnp.float32)
    out = fs.fused_cross_sublayer(x, p1, kv1, p2, kv2, num_heads=H, rms=rms,
                                  compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_cross_sublayer_quantized_kv():
    """int8 KV cache: the fused quant kernel must match the XLA reference
    computed on the dequantized floats exactly (same dequant math), and the
    quantization itself must stay within per-(token,head) int8 error of the
    float path."""
    x, p1, kv1, p2, kv2 = _cross_args()

    def q(kv):
        kq, ks = fs.quantize_kv(kv[0], H)
        vq, vs = fs.quantize_kv(kv[1], H)
        return kq, vq, ks.swapaxes(1, 2), vs

    qkv1, qkv2 = q(kv1), q(kv2)
    # the reference dequantizes K to float; the kernel additionally runs the
    # QK contraction in int8 with an in-kernel per-(cell, head) Q scale, so
    # they agree to quantization error, not exactly
    ref_q = fs.cross_sublayer_reference(x, p1, qkv1, p2, qkv2, num_heads=H,
                                        rms=False,
                                        compute_dtype=jnp.float32, quant=True)
    out_q = fs.fused_cross_sublayer(x, p1, qkv1, p2, qkv2, num_heads=H,
                                    rms=False, compute_dtype=jnp.float32,
                                    quant=True, interpret=True)
    rel_k = (jnp.linalg.norm(out_q - ref_q) / jnp.linalg.norm(ref_q))
    assert float(rel_k) < 0.01, float(rel_k)
    # total quantization error vs the float path is bounded
    ref_f = fs.cross_sublayer_reference(x, p1, kv1, p2, kv2, num_heads=H,
                                        rms=False, compute_dtype=jnp.float32)
    rel = (jnp.linalg.norm(out_q - ref_f) / jnp.linalg.norm(ref_f))
    assert float(rel) < 0.02, float(rel)


def test_quantize_dequantize_roundtrip_error():
    k = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 256), jnp.float32)
    kq, ks = fs.quantize_kv(k, H)
    back = fs.dequantize_kv(kq, ks)
    err = jnp.max(jnp.abs(back - k))
    # bound: half a quantization step of the per-(token, head) max
    step = jnp.max(ks.astype(jnp.float32))
    assert float(err) <= float(step) * 0.51 + 1e-6


def test_mlp_sublayer_matches_reference():
    ks = jax.random.split(jax.random.PRNGKey(3), 8)
    x = _mk(ks[0], B, L, C)
    sh = _mk(ks[1], B, C, scale=0.2)
    sc = _mk(ks[2], B, C, scale=0.2)
    g = _mk(ks[3], B, C, scale=0.5)
    w1 = _mk(ks[4], C, 4 * C, scale=0.05)
    b1 = _mk(ks[5], 4 * C, scale=0.05)
    w2 = _mk(ks[6], 4 * C, C, scale=0.05)
    b2 = _mk(ks[7], C, scale=0.05)
    args = (x, sh, sc, g, w1, b1, w2, b2)
    ref = fs.mlp_sublayer_reference(*args, compute_dtype=jnp.float32)
    out = fs.fused_mlp_sublayer(*args, compute_dtype=jnp.float32,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_block_fused_path_matches_unfused():
    """End-to-end ModulatedTransformerCrossBlock: the fused-sublayer branch
    (GVF_FUSED=interpret) vs the composed XLA branch, same params — proves
    the param-holder tree mirrors the module tree and the kernels compose."""
    import os

    from gvfdiffusion_tpu.nn.transformer import ModulatedTransformerCrossBlock

    from gvfdiffusion_tpu.ops import fused_sublayer as fsl_mod

    Bb, Tt, Nn, Cc, Hh = 1, 8, 128, 256, 8
    Li, Ls = 70, 32
    block = ModulatedTransformerCrossBlock(
        channels=Cc, num_heads=Hh, qk_rms_norm=True, dtype=jnp.float32)
    ks = jax.random.split(jax.random.PRNGKey(7), 6)
    x = _mk(ks[0], Bb, Tt, Nn, Cc)
    mod = _mk(ks[1], Bb, Cc)
    img = _mk(ks[2], Bb, Tt, Li, Cc, scale=0.5)
    stat = _mk(ks[3], Bb, Tt, Ls, Cc, scale=0.5)

    calls = []
    orig = fsl_mod.fused_self_sublayer
    fsl_mod.fused_self_sublayer = lambda *a, **k: calls.append(1) or orig(
        *a, **k)
    os.environ["GVF_FUSED"] = "off"
    try:
        params = block.init(ks[4], x, mod, img, stat)
        kv = block.apply(params, None, None, img, stat, kv_only=True)
        ref = block.apply(params, x, mod, None, None, None, kv)
        assert not calls
        os.environ["GVF_FUSED"] = "interpret"
        out = block.apply(params, x, mod, None, None, None, kv)
        assert calls, "fused branch was not taken"
    finally:
        os.environ.pop("GVF_FUSED", None)
        fsl_mod.fused_self_sublayer = orig
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_slat_block_fused_cross_matches_unfused():
    """ModulatedSparseCrossBlock (SLat torso): the fused single-context
    cross sublayer (L-gridded, single-buffered KV) vs the composed path."""
    import os

    from gvfdiffusion_tpu.models.trellis.slat_flow import (
        ModulatedSparseCrossBlock,
    )
    from gvfdiffusion_tpu.sparse.tensor import SparseVoxels

    Bb, Ll, Cc, Hh, Lk = 2, 256, 256, 8, 70
    block = ModulatedSparseCrossBlock(channels=Cc, num_heads=Hh,
                                      dtype=jnp.float32)
    ks = jax.random.split(jax.random.PRNGKey(3), 6)
    feats = _mk(ks[0], Bb, Ll, Cc)
    coords = jax.random.randint(ks[1], (Bb, Ll, 3), 0, 16)
    valid = jnp.ones((Bb, Ll), bool)
    x = SparseVoxels(feats=feats, coords=coords, valid=valid, resolution=16)
    mod = _mk(ks[2], Bb, Cc)
    ctx = _mk(ks[3], Bb, Lk, Cc, scale=0.5)

    os.environ["GVF_FUSED"] = "off"
    try:
        params = block.init(ks[4], x, mod, ctx)
        ref = block.apply(params, x, mod, ctx)
        os.environ["GVF_FUSED"] = "interpret"
        out = block.apply(params, x, mod, ctx)
    finally:
        os.environ.pop("GVF_FUSED", None)
    np.testing.assert_allclose(np.asarray(out.feats), np.asarray(ref.feats),
                               rtol=2e-3, atol=2e-3)


def test_cross_sublayer_single_context_lq_grid():
    x, p1, kv1, _, _ = _cross_args()
    ref = fs.cross_sublayer_reference(x, p1, kv1, None, None, num_heads=H,
                                      rms=False, compute_dtype=jnp.float32)
    out = fs.fused_cross_sublayer(x, p1, kv1, num_heads=H, rms=False,
                                  compute_dtype=jnp.float32, interpret=True,
                                  lq_block=64, kv_buffers=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_cross_sublayer_quant_dual_context_lq_grid():
    """The 3-way-CFG configuration: dual-context quant kernel with gridded
    query rows (nn/transformer.py passes lq_block=N//2 at BT=96 to fit the
    scoped-VMEM limit); must match the ungridded quant kernel exactly."""
    x, p1, kv1, p2, kv2 = _cross_args()

    def q(kv):
        kq, ks = fs.quantize_kv(kv[0], H)
        vq, vs = fs.quantize_kv(kv[1], H)
        return kq, vq, ks.swapaxes(1, 2), vs

    qkv1, qkv2 = q(kv1), q(kv2)
    base = fs.fused_cross_sublayer(x, p1, qkv1, p2, qkv2, num_heads=H,
                                   rms=False, compute_dtype=jnp.float32,
                                   quant=True, interpret=True)
    grid = fs.fused_cross_sublayer(x, p1, qkv1, p2, qkv2, num_heads=H,
                                   rms=False, compute_dtype=jnp.float32,
                                   quant=True, interpret=True,
                                   lq_block=x.shape[1] // 2)
    # not bit-identical: the in-kernel per-(cell, head) Q scale is a max
    # over the row block, so gridding changes the quantization grid — the
    # two kernels agree to int8-quantization error, not exactly
    rel = jnp.linalg.norm(grid - base) / jnp.linalg.norm(base)
    assert float(rel) < 5e-3, float(rel)


def test_supports_predicates():
    assert fs.self_sublayer_supports(32, 512, 512, 16)
    assert fs.temporal_sublayer_supports(1, 32, 512, 512, 16)
    assert fs.cross_sublayer_supports(32, 512, 512, 16, 1370, 512)
    assert fs.mlp_sublayer_supports(32, 512, 512, 2048)
    assert not fs.self_sublayer_supports(32, 500, 512, 16)  # ragged L
    assert not fs.self_sublayer_supports(32, 512, 384, 16)  # D = 24
