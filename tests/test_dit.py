"""DiT model tests: shapes, zero-init identity, jit/remat, grad flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvfdiffusion_tpu.models.dit import DiT


def tiny_dit(**kw):
    cfg = dict(
        resolution=8,
        in_channels=4,
        model_channels=32,
        static_cond_channels=14,
        image_cond_channels=24,
        out_channels=4,
        num_blocks=2,
        num_heads=4,
        pe_mode="ape",
        qk_rms_norm=True,
    )
    cfg.update(kw)
    return DiT(**cfg)


def make_inputs(rng, B=2, T=3, N=8, L=5):
    ks = jax.random.split(rng, 5)
    return dict(
        x=jax.random.normal(ks[0], (B, T, N, 4)),
        t=jnp.array([10.0, 500.0])[:B],
        cond_images=jax.random.normal(ks[1], (B, T, L, 24)),
        static_latent=jax.random.normal(ks[2], (B, 16, 14)),
        positions=jax.random.uniform(ks[3], (B, N, 3)),
    )


def test_forward_shape_and_zero_init():
    model = tiny_dit()
    inputs = make_inputs(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), **inputs)
    out = model.apply(params, **inputs)
    assert out.shape == (2, 3, 8, 4)
    # FinalLayer is zero-init -> output must be exactly zero at init
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_adaln_zero_blocks_identity_at_init():
    # With zero-init adaLN, gates are 0 -> gated paths are identity, but cross
    # attns are un-gated, so output != input; still must be finite & stable.
    model = tiny_dit(no_temporal_attn=True)
    inputs = make_inputs(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), **inputs)
    out = model.apply(params, **inputs)
    assert np.isfinite(np.asarray(out)).all()


def test_jit_and_remat_agree():
    inputs = make_inputs(jax.random.PRNGKey(0))
    m0 = tiny_dit(remat_blocks=0)
    m2 = tiny_dit(remat_blocks=2)
    params = m0.init(jax.random.PRNGKey(1), **inputs)

    f0 = jax.jit(lambda p, i: m0.apply(p, **i))
    f2 = jax.jit(lambda p, i: m2.apply(p, **i))
    np.testing.assert_allclose(
        np.asarray(f0(params, inputs)), np.asarray(f2(params, inputs)), atol=1e-6
    )


def test_grad_flows_to_all_params():
    model = tiny_dit()
    inputs = make_inputs(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), **inputs)

    def loss(p):
        # perturb away from zero-init so gradients reach every layer
        out = model.apply(p, **inputs)
        return jnp.sum(out**2) + sum(
            jnp.sum(x**2) for x in jax.tree.leaves(p)
        )

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)


def test_temporal_attention_mixes_frames():
    # with temporal attention, a perturbation in frame 0 must influence frame 2
    model = tiny_dit(no_temporal_attn=False)
    inputs = make_inputs(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), **inputs)
    # re-randomize final layer so the output isn't identically zero
    params = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(2), x.shape) * 0.02, params
    )
    out0 = model.apply(params, **inputs)
    x2 = inputs["x"].at[:, 0].add(1.0)
    out1 = model.apply(params, **{**inputs, "x": x2})
    diff_frame2 = np.abs(np.asarray(out1[:, 2] - out0[:, 2])).max()
    assert diff_frame2 > 1e-6


def test_mem_ratio_mapping():
    model = tiny_dit(num_blocks=12)
    assert model.mem_ratio_to_remat_blocks(1.0) == 0
    assert model.mem_ratio_to_remat_blocks(0.2) == 11
    assert model.mem_ratio_to_remat_blocks(0.0) == 12


def test_cross_kv_cache_matches_direct():
    # precomputed cross-attention KV must give bit-identical outputs
    model = tiny_dit()
    inputs = make_inputs(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), **inputs)
    params = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(3), x.shape) * 0.05, params
    )
    out_direct = model.apply(params, **inputs)
    kv = model.apply(
        params, inputs["x"], inputs["t"], inputs["cond_images"],
        inputs["static_latent"], inputs["positions"], kv_only=True,
    )
    assert len(kv) == 2  # one entry per block
    out_cached = model.apply(params, **inputs, cross_kv=kv)
    np.testing.assert_allclose(
        np.asarray(out_direct), np.asarray(out_cached), atol=1e-6
    )


@pytest.mark.parametrize("pe_mode", ["learnable", "none", "rope"])
def test_pe_modes(pe_mode):
    model = tiny_dit(pe_mode=pe_mode)
    inputs = make_inputs(jax.random.PRNGKey(0))
    if pe_mode != "ape":
        inputs["positions"] = None
    params = model.init(jax.random.PRNGKey(1), **inputs)
    out = model.apply(params, **inputs)
    assert out.shape == (2, 3, 8, 4)


def test_temporal_einsum_layout_matches_transpose():
    """The transpose-free temporal attention (temporal_layout='einsum') must
    be numerically identical to the relayout path with the SAME params."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gvfdiffusion_tpu.models.dit import DiT

    kw = dict(resolution=8, in_channels=4, model_channels=32,
              static_cond_channels=14, image_cond_channels=16, out_channels=4,
              num_blocks=2, num_heads=4, pe_mode="ape", qk_rms_norm=True)
    a = DiT(**kw)
    b = DiT(temporal_layout="einsum", **kw)
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    B, T, N, C = 2, 3, 8, 4
    x = jax.random.normal(ks[0], (B, T, N, C))
    ci = jax.random.normal(ks[1], (B, T, 5, 16))
    sl = jax.random.normal(ks[2], (B, 8, 14))
    pos = jax.random.uniform(ks[3], (B, N, 3))
    t = jnp.asarray([10.0, 20.0])
    params = a.init(ks[4], x, t, ci, sl, pos)
    out_a = a.apply(params, x, t, ci, sl, pos)
    out_b = b.apply(params, x, t, ci, sl, pos)  # same params, other layout
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=2e-5, rtol=2e-5)
