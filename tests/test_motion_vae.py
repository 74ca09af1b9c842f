"""Motion VAE tests: shapes, zero-init decoder, KL, roundtrip smoke."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from gvfdiffusion_tpu.models.motion_vae import MotionVAE, PointEmbed, pad_static_gs


def tiny_vae(**kw):
    cfg = dict(
        depth=2, dim=48, queries_dim=48, output_dim=14, num_inputs=64,
        num_latents=8, latent_dim=4, heads=4, knn_k=4,
    )
    cfg.update(kw)
    return MotionVAE(**cfg)


def make_inputs(rng, B=2, T=3, N=64, G=32):
    ks = jax.random.split(rng, 4)
    gs_list = [
        np.asarray(jax.random.normal(ks[0], (G, 14))),
        np.asarray(jax.random.normal(ks[1], (G - 5, 14))),
    ][:B]
    static_gs, valid = pad_static_gs(gs_list)
    return dict(
        static_gs=static_gs,
        gs_valid=valid,
        static_pc=jax.random.normal(ks[2], (B, N, 3)),
        delta_pc=jax.random.normal(ks[3], (B, T, N, 3)) * 0.1,
        rng=jax.random.PRNGKey(42),
    )


def test_point_embed_layout():
    pe = PointEmbed(hidden_dim=48)
    p = jnp.array([[[0.0, 0.0, 0.0]]])
    out = pe(p)
    assert out.shape == (1, 1, 48)
    # at zero position: sin=0, cos=1 in each block of 8 (e=8 per axis)
    v = np.asarray(out)[0, 0]
    e = 8
    for axis in range(3):
        block = v[axis * 2 * e : (axis + 1) * 2 * e]
        np.testing.assert_allclose(block[:e], 0.0)
        np.testing.assert_allclose(block[e:], 1.0)


def test_forward_shapes_and_zero_init():
    model = tiny_vae()
    inputs = make_inputs(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), **inputs)
    out = model.apply(params, **inputs)
    B, T, G = 2, 3, 32
    assert out["logits"].shape == (B, T, G, 14)
    # to_outputs is zero-init -> decoded deltas are exactly zero at init
    np.testing.assert_array_equal(np.asarray(out["logits"]), 0.0)
    assert out["kl"].shape == (B * T,)
    assert (np.asarray(out["kl"]) >= 0).all()
    assert out["mean"].shape == (B * T, 8, 4)


def test_encode_decode_separately():
    model = tiny_vae()
    inputs = make_inputs(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), **inputs)

    kl, mean, logvar, sampled = model.apply(
        params, inputs["static_pc"], inputs["delta_pc"], inputs["static_gs"],
        inputs["gs_valid"], method=MotionVAE.encode,
    )
    assert sampled.shape == (2, 8, 14)
    z = mean  # posterior mode
    out = model.apply(params, z, inputs["static_gs"], 3, method=MotionVAE.decode)
    assert out.shape == (2, 3, 32, 14)


def test_kl_zero_for_standard_normal_posterior():
    # kl formula check: mean=0, logvar=0 -> kl = 0
    model = tiny_vae()
    mean = jnp.zeros((4, 8, 4))
    logvar = jnp.zeros((4, 8, 4))
    kl = 0.5 * jnp.mean(mean**2 + jnp.exp(logvar) - 1.0 - logvar, axis=(1, 2))
    np.testing.assert_allclose(np.asarray(kl), 0.0)


def test_jit_full_forward():
    model = tiny_vae()
    inputs = make_inputs(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), **inputs)
    f = jax.jit(lambda p, i: model.apply(p, **i))
    out = f(params, inputs)
    assert np.isfinite(np.asarray(out["kl"])).all()


@pytest.mark.slow
def test_grads_finite():
    model = tiny_vae()
    inputs = make_inputs(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), **inputs)

    def loss(p):
        out = model.apply(p, **inputs)
        return jnp.mean(out["logits"] ** 2) + jnp.mean(out["kl"])

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


def test_decode_chunked_matches_unchunked():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gvfdiffusion_tpu.models.motion_vae import MotionVAE

    vae = MotionVAE(depth=1, dim=24, queries_dim=24, num_inputs=16,
                    num_latents=4, latent_dim=4, heads=4, output_dim=14)
    z = jax.random.normal(jax.random.PRNGKey(0), (2 * 3, 4, 4))
    q = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 14))
    params = vae.init(jax.random.PRNGKey(2), z, q, 3, method=vae.decode)
    full = vae.apply(params, z, q, 3, method=vae.decode)
    chunked = vae.apply(params, z, q, 3, 8, method=vae.decode)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full), atol=1e-5)
